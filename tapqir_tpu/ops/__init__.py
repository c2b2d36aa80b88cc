"""Low-level TPU ops: Pallas kernels and scan primitives."""
