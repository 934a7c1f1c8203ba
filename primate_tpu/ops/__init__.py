"""Pallas TPU kernels for the hot compute paths (sparse SpMM, fused sweeps)."""
