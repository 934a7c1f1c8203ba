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


def test_svds_matches_numpy():
	rng = np.random.default_rng(11)
	X = rng.normal(size=(80, 40)) @ np.diag(np.linspace(0.1, 4.0, 40)) 
	U, s, Vh = pt.svds(X, k=5, seed=0)
	s_true = np.linalg.svd(X, compute_uv=False)
	assert np.allclose(np.sort(s), np.sort(s_true)[-5:], rtol=1e-5)
	# Triplet consistency: X ≈ U diag(s) Vh on the recovered subspace
	assert np.allclose(X @ Vh.T, U * s[None, :], atol=1e-4)
	assert np.allclose(U.T @ U, np.eye(5), atol=1e-4)


def test_svds_wide_matrix():
	rng = np.random.default_rng(12)
	X = rng.normal(size=(30, 90))
	U, s, Vh = pt.svds(X, k=3, seed=1)
	s_true = np.linalg.svd(X, compute_uv=False)
	assert np.allclose(np.sort(s), np.sort(s_true)[-3:], rtol=1e-5)
	assert np.allclose(X @ Vh.T, U * s[None, :], atol=1e-4)
	assert np.allclose(Vh @ Vh.T, np.eye(3), atol=1e-4)


def test_svds_values_only_and_validation():
	rng = np.random.default_rng(13)
	X = rng.normal(size=(50, 20))
	s = pt.svds(X, k=2, seed=2, return_vectors=False)
	assert s.shape == (2,)
	with pytest.raises(AssertionError):
		pt.svds(X, k=20)
