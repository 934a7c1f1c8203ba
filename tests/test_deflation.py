"""DeflatedOperator + deflated_trace: eigenvector deflation for variance reduction."""

import numpy as np
import pytest
import jax.numpy as jnp

import primate_tpu as pt
from primate_tpu.operators import DeflatedOperator
from primate_tpu.recipes import deflated_trace


def _spiky(n=96, n_spikes=4, seed=3):
	"""PSD spectrum with a few dominant outliers — plain Hutchinson's worst case."""
	ew = np.concatenate([np.linspace(0.5, 1.5, n - n_spikes), np.array([40.0, 55.0, 70.0, 90.0])])
	return pt.symmetric(n, pd=True, ew=ew, seed=seed), ew


def test_deflated_operator_matmat():
	"""op ≡ P A P + fill·VVᵀ against a dense construction."""
	n, k = 32, 3
	A = np.asarray(pt.symmetric(n, pd=True, seed=1), np.float64)
	V, _ = np.linalg.qr(np.random.default_rng(2).normal(size=(n, k)))
	P = np.eye(n) - V @ V.T
	for fill in (0.0, 1.0):
		expected = P @ A @ P + fill * V @ V.T
		op = DeflatedOperator(jnp.asarray(A), jnp.asarray(V), fill=fill)
		W = np.random.default_rng(4).normal(size=(n, 5))
		assert np.allclose(np.asarray(op.matmat(jnp.asarray(W))), expected @ W, atol=1e-10)
		# probe-major path agrees with the column-major one
		assert np.allclose(np.asarray(op.matmat_t(jnp.asarray(W.T))), (expected @ W).T, atol=1e-10)
		assert np.allclose(np.asarray(op @ jnp.asarray(W[:, 0])), expected @ W[:, 0], atol=1e-10)


def test_deflated_trace_identity_exact_split():
	"""tr(A) = tr(VᵀAV) + tr(PAP) exactly for ANY orthonormal V: the recipe's
	estimate equals plain hutch's accuracy bar even with loose eigenvectors."""
	A, ew = _spiky()
	n = A.shape[0]
	est = deflated_trace(A, fun=None, k=4, seed=5, converge="count", count=256)
	assert abs(est - ew.sum()) < 10 / np.sqrt(n)


@pytest.mark.slow
def test_deflated_trace_variance_reduction():
	"""Deflating the spikes must shrink the seed-to-seed spread vs plain hutch."""
	A, ew = _spiky()
	plain = [pt.hutch(A, seed=s, converge="count", count=128) for s in range(10)]
	defl = [deflated_trace(A, fun=None, k=4, seed=s, converge="count", count=128) for s in range(10)]
	assert np.std(defl) < 0.25 * np.std(plain), (np.std(defl), np.std(plain))
	assert abs(np.mean(defl) - ew.sum()) < abs(np.mean(plain) - ew.sum()) + 1.0


def test_deflated_logdet():
	"""log-spectrum deflation: fill=1 makes the deflated directions contribute 0."""
	A, ew = _spiky()
	true = float(np.sum(np.log(ew)))
	est = deflated_trace(A, fun="log", k=4, deg=24, orth=8, seed=7, converge="count", count=1024)
	# The exact part carries the four spikes (Σ log λ ≈ +16.4); the remaining
	# MC noise is the flat [0.5, 1.5] log-spectrum only: std ≈ 0.15 at 1024
	# rademacher probes (3.3σ bound).
	assert abs(est - true) < 0.5, (est, true)


def test_deflated_trace_full_result():
	A, ew = _spiky()
	est, res = deflated_trace(A, fun=None, k=4, seed=8, full=True, converge="count", count=64)
	assert np.isclose(res.estimate, est)
	assert res.info["deflated_eigenvalues"].shape == (4,)
	assert np.allclose(np.sort(res.info["deflated_eigenvalues"]), ew[-4:], atol=1e-3)
