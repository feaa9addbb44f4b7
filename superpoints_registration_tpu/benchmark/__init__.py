"""Evaluation harnesses: 3DMatch/Predator protocol, DGR protocol, ModelNet."""
