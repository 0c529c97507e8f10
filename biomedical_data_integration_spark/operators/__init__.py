"""Operators: the engine's distributed kernels."""
