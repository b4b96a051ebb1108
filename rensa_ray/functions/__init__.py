"""Vectorized per-batch functions for map_batches stages."""
