"""Device mesh, sharding, and SPMD train/eval steps."""
