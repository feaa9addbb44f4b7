"""Training runtime: optimizer, train/eval steps, trainer loop, checkpoints."""
