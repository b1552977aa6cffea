"""Pallas TPU kernels for the hot preprocessing/compute paths."""
