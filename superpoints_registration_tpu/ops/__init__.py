"""Pure-function compute ops (geometry, preprocessing, kernels)."""
