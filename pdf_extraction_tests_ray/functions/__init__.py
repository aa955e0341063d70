"""Vectorized text/sketch primitives used by the Ray stages."""
