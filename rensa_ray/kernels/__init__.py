"""Pure math kernels (numpy / python ints) — no Ray dependencies."""
