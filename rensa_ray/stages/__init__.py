"""Ray Data stage callables (map_batches task functions and actor classes)."""
