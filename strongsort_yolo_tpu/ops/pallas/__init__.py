"""Hand-written Pallas TPU kernels for the postprocess hot path."""
