"""Pallas TPU kernels (and XLA reference paths) for the hot ops."""
