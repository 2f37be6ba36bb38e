"""Dataset stage callables (map_batches functions and actor classes)."""
