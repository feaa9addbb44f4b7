"""Pallas TPU kernels for the hot irregular ops."""
