"""Data pipelines: datasets, augmentations, collation to static budgets."""
