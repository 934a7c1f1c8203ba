"""eigsh: blocked-LOBPCG extremal eigensolver (scipy-compatible surface)."""

import numpy as np
import pytest
import jax.numpy as jnp

import primate_tpu as pt


def _fixture(n=64, lo=0.5, hi=3.0, seed=1):
	ew = np.linspace(lo, hi, n)
	A = pt.symmetric(n, pd=True, ew=ew, seed=seed)
	return A, ew


def test_eigsh_largest_algebraic():
	A, ew = _fixture()
	w, V = pt.eigsh(A, k=4, which="LA", seed=0)
	assert np.allclose(w, ew[-4:], atol=1e-4)
	# Residual ‖AV − VΛ‖ and orthonormality
	r = np.asarray(A) @ V - V * w[None, :]
	assert np.abs(r).max() < 1e-3
	assert np.allclose(V.T @ V, np.eye(4), atol=1e-6)


def test_eigsh_smallest_algebraic():
	A, ew = _fixture()
	w = pt.eigsh(A, k=4, which="SA", seed=0, return_eigenvectors=False)
	assert np.allclose(w, ew[:4], atol=1e-4)


def test_eigsh_both_ends():
	A, ew = _fixture()
	w, _ = pt.eigsh(A, k=4, which="BE", seed=0)
	assert np.allclose(w, np.concatenate([ew[:2], ew[-2:]]), atol=1e-4)


def test_eigsh_largest_magnitude_indefinite():
	"""LM on an indefinite spectrum must pick the negative end when it wins."""
	ew = np.sort(np.concatenate([-np.linspace(2.5, 3.0, 3), np.linspace(0.2, 2.0, 61)]))
	B = pt.symmetric(64, ew=ew, seed=2)
	w = pt.eigsh(B, k=3, which="LM", seed=0, return_eigenvectors=False)
	assert np.allclose(np.sort(np.abs(w)), np.sort(np.abs(ew))[-3:], atol=1e-3)


def test_eigsh_on_sparse_operator():
	import scipy.sparse as sps
	from primate_tpu.operators.sparse import DIAOperator

	n = 256
	L = sps.diags([-np.ones(n - 1), 3.0 * np.ones(n), -np.ones(n - 1)], [-1, 0, 1]).tocsr()
	op = DIAOperator.from_scipy(L, dtype=jnp.float64)
	kk = np.arange(1, n + 1)
	ew = np.sort(3.0 - 2.0 * np.cos(kk * np.pi / (n + 1)))
	w = pt.eigsh(op, k=3, which="LA", seed=0, return_eigenvectors=False)
	assert np.allclose(w, ew[-3:], atol=1e-6)


def test_eigsh_validates():
	A, _ = _fixture(16)
	with pytest.raises(AssertionError):
		pt.eigsh(A, k=16)
	with pytest.raises(AssertionError):
		pt.eigsh(A, k=2, which="XX")
