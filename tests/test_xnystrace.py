"""XNysTrace: leave-one-out Nyström trace estimator (PSD operators)."""

import numpy as np
import pytest
import jax.numpy as jnp

import primate_tpu as pt
from primate_tpu.random import sample_isotropic, as_key
from primate_tpu.operators import aslinop
from primate_tpu.trace import _xnystrace_program


def test_xnystrace_exact_low_rank():
	"""Exact (to rounding) whenever rank(A) < m."""
	n, r = 64, 10
	ew = np.concatenate([np.zeros(n - r), np.linspace(1.0, 3.0, r)])
	A = pt.symmetric(n, ew=ew, seed=1)
	est = pt.xnystrace(A, m=r + 4, seed=2)
	assert abs(est - ew.sum()) < 1e-4 * abs(ew.sum())


def test_xnystrace_accuracy_decaying_spectrum():
	"""On a decaying spectrum (the estimator's regime) the default budget beats
	the hutchpp test bar (1/√n, `tests/test_trace.py:36-42`)."""
	n = 54
	ew = 2.0 * 0.7 ** np.arange(n)  # geometric decay, full rank
	A = pt.symmetric(n, pd=True, ew=ew, seed=1)
	est = pt.xnystrace(A, seed=3)
	assert abs(est - ew.sum()) < 1.0 / np.sqrt(n)


def test_xnystrace_matches_bruteforce_loo():
	"""The batched identities ≡ explicit per-probe leave-one-out Nyström."""
	n, m = 24, 8
	ew = np.linspace(0.5, 2.0, n)
	A = np.asarray(pt.symmetric(n, pd=True, ew=ew, seed=4), np.float64)

	key = as_key(7)
	Om = np.asarray(sample_isotropic(key, (n, m), pdf="normal", dtype=jnp.float64))
	Y0 = A @ Om
	nu = float(np.finfo(np.float64).eps * np.linalg.norm(Y0) / np.sqrt(n))
	As = A + nu * np.eye(n)

	expected = np.empty(m)
	for i in range(m):
		keep = [j for j in range(m) if j != i]
		Om_i, w = Om[:, keep], Om[:, i]
		Y_i = As @ Om_i
		H_i = Om_i.T @ Y_i
		Ahat = Y_i @ np.linalg.solve(H_i, Y_i.T)
		expected[i] = np.trace(Ahat) + w @ (As - Ahat) @ w - nu * n

	ours = np.asarray(_xnystrace_program(aslinop(jnp.asarray(A)), key, n=n, m=m, pdf="normal"))
	assert np.allclose(ours, expected, rtol=1e-8, atol=1e-8)


def test_xnystrace_full_result():
	A = pt.symmetric(32, pd=True, seed=5)
	est, res = pt.xnystrace(A, m=16, seed=6, full=True)
	assert res.nit == 16
	assert res.samples.shape == (16,)
	assert np.isclose(res.samples.mean(), est)


@pytest.mark.parametrize("pdf", ["normal", "sphere", "rademacher"])
def test_xnystrace_pdfs_unbiased(pdf):
	"""Every isotropic pdf with E[ωωᵀ]=I gives an unbiased estimate."""
	n = 48
	ew = np.linspace(0.2, 1.5, n)
	A = pt.symmetric(n, pd=True, ew=ew, seed=8)
	ests = [pt.xnystrace(A, m=24, pdf=pdf, seed=s) for s in range(16)]
	se = np.std(ests) / np.sqrt(len(ests))
	assert abs(np.mean(ests) - ew.sum()) < max(4 * se, 0.25)


def test_xnystrace_on_sparse_operator():
	import scipy.sparse as sps
	from primate_tpu.operators.sparse import DIAOperator

	n = 200
	L = sps.diags([-np.ones(n - 1), 2.5 * np.ones(n), -np.ones(n - 1)], [-1, 0, 1]).tocsr()
	op = DIAOperator.from_scipy(L, dtype=jnp.float64)
	est = pt.xnystrace(op, m=n, seed=9)
	# Full-rank flat-ish spectrum: not exact at m = n (exactness needs
	# rank < m), but the full-budget estimate lands within 1%.
	assert abs(est - 2.5 * n) < 1e-2 * 2.5 * n


def test_xnystrace_empty():
	assert pt.xnystrace(np.zeros((0, 0))) == 0.0
