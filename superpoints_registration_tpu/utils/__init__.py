"""Shared utilities: logging, run directories, prefetching."""
