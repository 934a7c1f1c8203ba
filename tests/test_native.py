"""Native (C++) sparse-prep engine vs the scipy fallback path."""

import numpy as np
import pytest
import scipy.sparse as sps

from primate_tpu import native
from primate_tpu.operators.sparse import BSROperator, DIAOperator

pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


def _rand_csr(n, m, density, seed, dtype=np.float64):
	A = sps.random(n, m, density=density, random_state=np.random.default_rng(seed), format="csr")
	return A.astype(dtype)


@pytest.mark.parametrize("bm,bn", [(4, 4), (8, 8), (8, 16)])
@pytest.mark.parametrize("n", [64, 70])  # 70: padded (non-divisible) grid
def test_native_bsr_matches_scipy_path(bm, bn, n):
	A = _rand_csr(n, n, 0.07, seed=1)
	op_nat = BSROperator.from_scipy(A, blocksize=(bm, bn), engine="native")
	op_sp = BSROperator.from_scipy(A, blocksize=(bm, bn), engine="scipy")
	assert op_nat.shape == op_sp.shape == (n, n)
	assert np.allclose(np.asarray(op_nat.todense()), A.toarray())
	assert np.allclose(np.asarray(op_sp.todense()), A.toarray())
	V = np.random.default_rng(2).normal(size=(n, 5))
	assert np.allclose(np.asarray(op_nat.matmat(V)), A @ V, atol=1e-10)


def test_native_bsr_empty_rows_covered():
	n = 32
	A = sps.csr_matrix((n, n))
	A[0, 0] = 2.0
	op = BSROperator.from_scipy(A.tocsr(), blocksize=(8, 8), engine="native")
	# every block-row stores at least one block (coverage for the kernel)
	counts = np.diff(np.asarray(op.indptr))
	assert (counts >= 1).all()
	assert np.allclose(np.asarray(op.todense()), A.toarray())


def test_native_dia_matches_scipy_path():
	n = 120
	A = sps.diags(
		[np.arange(1, n - 4, dtype=float), np.ones(n), -np.ones(n - 1)], [5, 0, -1]
	).tocsr()
	op_nat = DIAOperator.from_scipy(A, engine="native")
	op_sp = DIAOperator.from_scipy(A, engine="scipy")
	assert op_nat.offsets == op_sp.offsets
	assert np.allclose(np.asarray(op_nat.bands), np.asarray(op_sp.bands))
	assert np.allclose(np.asarray(op_nat.todense()), A.toarray())


def test_native_dia_f32():
	n = 50
	A = sps.diags([np.ones(n - 1), 2 * np.ones(n)], [1, 0]).tocsr().astype(np.float32)
	op = DIAOperator.from_scipy(A, engine="native")
	assert np.allclose(np.asarray(op.todense()), A.toarray())


def test_csr_analyze_matches_numpy_fallback():
	import scipy.sparse as sps
	from primate_tpu.native import available, csr_analyze
	from primate_tpu.operators.prepare import _analyze

	rng = np.random.default_rng(17)
	for shape, density in [((300, 300), 0.01), ((200, 120), 0.03), ((64, 64), 0.2)]:
		A = sps.random(*shape, density=density, random_state=rng, format="csr")
		stats = _analyze(A, (8, 8))  # whichever engine is active
		# numpy reference, computed inline
		rows = np.repeat(np.arange(shape[0], dtype=np.int64), np.diff(A.indptr))
		cols = A.indices.astype(np.int64)
		offs = cols - rows
		want_diags = len(np.unique(offs))
		want_bw = int(np.abs(offs).max())
		want_tiles = len(np.unique(rows // 8 * (1 + (shape[1] - 1) // 8) + cols // 8))
		want_maxrow = int(np.diff(A.indptr).max())
		assert stats == {
			"n_diags": want_diags,
			"bandwidth": want_bw,
			"n_tiles": want_tiles,
			"max_row_nnz": want_maxrow,
		}, (shape, stats)
	if available():
		got = csr_analyze(sps.eye(50).tocsr(), 8, 8)
		assert got == {"n_diags": 1, "bandwidth": 0, "n_tiles": 7, "max_row_nnz": 1}
