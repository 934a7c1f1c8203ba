"""Compiled reference-architecture SLQ baseline (ctypes-bound C++).

The honest denominator for ``bench.py``'s ``vs_baseline``: the reference's
serial host loop (one probe at a time, `src/primate/trace.py:114-115`) over a
compiled Lanczos recurrence + CSR SpMV (`include/lanczos.h:89-148`,
`eigen_operators.h:58-104`) — with no Python interpreter cost per step, unlike
the numpy stand-in used in rounds 1-2. The real package cannot be built in
this environment; see `benchmarks/REFERENCE_BUILD.md` for the record and the
numpy-vs-compiled calibration.

The tridiagonal eigensolve + Gauss-Welsch quadrature run in numpy/LAPACK here,
exactly as the reference does (`tridiag.py` dispatches to scipy LAPACK).
"""

import ctypes
import os
import subprocess
import time
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "ref_native.cpp"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")


def _build() -> Optional[ctypes.CDLL]:
	so = _HERE / "_ref_native.so"
	try:
		if not so.exists() or so.stat().st_mtime < _SRC.stat().st_mtime:
			tmp = so.with_suffix(f".{os.getpid()}.tmp.so")
			# -ffast-math lets the reductions vectorize (Eigen's SIMD reductions
			# reassociate the same way) — measured 2x on the sweep vs plain -O3.
			subprocess.run(
				["g++", "-O3", "-march=native", "-ffast-math", "-funroll-loops", "-shared", "-fPIC", str(_SRC), "-o", str(tmp)],
				check=True,
				capture_output=True,
				timeout=120,
			)
			os.replace(tmp, so)
		lib = ctypes.CDLL(str(so))
	except Exception:
		return None
	lib.slq_sweep_csr_f32.restype = ctypes.c_int
	lib.slq_sweep_csr_f32.argtypes = [
		ctypes.c_int64, _i64p, _i32p, _f32p,
		ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_uint64,
		_f64p, _f64p, _f64p,
	]
	return lib


def get_lib() -> Optional[ctypes.CDLL]:
	global _LIB, _TRIED
	if not _TRIED:
		_LIB = _build()
		_TRIED = True
	return _LIB


def available() -> bool:
	return get_lib() is not None


def native_slq_logdet(A, deg: int, orth: int, probes: int, seed: int = 0) -> tuple:
	"""SLQ logdet with the compiled reference-architecture sweep.

	Returns ``(estimate, wall_seconds)``; wall covers the full estimator (C++
	sweeps + LAPACK quadrature), matching what the real package would pay.
	"""
	lib = get_lib()
	assert lib is not None, "compiled baseline unavailable (g++ failed?)"
	n = A.shape[0]
	indptr = np.ascontiguousarray(A.indptr, np.int64)
	indices = np.ascontiguousarray(A.indices, np.int32)
	data = np.ascontiguousarray(A.data, np.float32)
	alphas = np.zeros((probes, deg), np.float64)
	betas = np.zeros((probes, deg), np.float64)
	norms2 = np.zeros(probes, np.float64)

	t0 = time.perf_counter()
	rc = lib.slq_sweep_csr_f32(n, indptr, indices, data, deg, orth, probes, seed, alphas, betas, norms2)
	assert rc == 0, f"native sweep failed rc={rc}"
	# Gauss-Welsch per probe, batched through LAPACK (as tridiag.py does).
	T = np.zeros((probes, deg, deg))
	ii = np.arange(deg)
	T[:, ii, ii] = alphas
	T[:, ii[:-1], ii[1:]] = betas[:, : deg - 1]
	T[:, ii[1:], ii[:-1]] = betas[:, : deg - 1]
	theta, Y = np.linalg.eigh(T)
	tau = Y[:, 0, :] ** 2
	est = float(np.mean(np.sum(np.log(np.maximum(theta, 1e-30)) * tau, axis=1) * norms2))
	return est, time.perf_counter() - t0
