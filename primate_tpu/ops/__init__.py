"""Pallas TPU kernels for the hot compute paths (sparse SpMM, fused sweeps)."""

from .dia_pallas import dia_matmat, dia_matmat_pallas
from .spmm_pallas import bsr_matmat, bsr_matmat_pallas

__all__ = ["bsr_matmat", "bsr_matmat_pallas", "dia_matmat", "dia_matmat_pallas"]
