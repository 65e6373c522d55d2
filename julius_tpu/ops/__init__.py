"""Compute kernels: dense acoustic scorers and search primitives."""
