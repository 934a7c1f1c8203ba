"""Differentiability of the estimation pipeline (no reference parity — the
reference's C++/FFI core cannot differentiate at all; here the whole SLQ
pipeline (scan → eigh → quadrature) is jax-transformable end to end).

The flagship use: GP log-marginal-likelihood gradients, where
d/dθ logdet(A(θ)) = tr(A⁻¹ ∂A/∂θ) is estimated by differentiating the SLQ
estimator directly.
"""

import numpy as np
import jax
import jax.numpy as jnp

import primate_tpu as pt
from primate_tpu.random import sample_isotropic


def _slq_logdet(Aop, key, deg, nv=64):
	M = pt.MatrixFunction(Aop, fun="log", deg=deg, orth=-1)
	V = sample_isotropic(key, (Aop.shape[0], nv), pdf="rademacher", dtype=jnp.float64)
	return jnp.mean(M.quad(V))


def test_slq_logdet_grad_matches_trace_inverse():
	n = 32
	B = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.float64)

	def loss(theta):
		A = theta * jnp.eye(n) + B @ B.T / n
		return _slq_logdet(A, jax.random.PRNGKey(1), deg=n)

	g = float(jax.grad(loss)(1.5))
	Ad = np.asarray(1.5 * jnp.eye(n) + B @ B.T / n)
	true = np.trace(np.linalg.inv(Ad))
	assert abs(g - true) / true < 0.05


def test_slq_grad_through_sparse_bands():
	"""Gradients flow into DIA band values (sparse precision-matrix learning)."""
	import scipy.sparse as sps
	from primate_tpu.operators.sparse import DIAOperator

	n = 48
	L = sps.diags([-np.ones(n - 1), 3.0 * np.ones(n), -np.ones(n - 1)], [-1, 0, 1])
	op0 = DIAOperator.from_scipy(L)

	def loss(bands):
		op = DIAOperator(bands, op0.offsets, op0.shape)
		return _slq_logdet(op, jax.random.PRNGKey(2), deg=24, nv=32)

	g = jax.grad(loss)(jnp.asarray(op0.bands, jnp.float64))
	assert g.shape == op0.bands.shape
	assert np.all(np.isfinite(np.asarray(g)))
	# d logdet / d main-diagonal entries = diag(A^{-1}) (up to MC error)
	diag_inv = np.diag(np.linalg.inv(L.toarray()))
	k_main = op0.offsets.index(0)
	rel = np.abs(np.asarray(g[k_main]) - diag_inv) / np.abs(diag_inv)
	assert np.median(rel) < 0.5  # noisy per-entry, but unbiased


def test_matvec_path_jvp_finite():
	n = 24
	A = jnp.asarray(pt.symmetric(n, pd=True, seed=3), jnp.float64)
	v = jax.random.normal(jax.random.PRNGKey(4), (n,), jnp.float64)

	def f(s):
		M = pt.MatrixFunction(s * A, fun="sqrt", deg=n, orth=-1)
		return jnp.sum(M @ v)

	val, tangent = jax.jvp(f, (1.0,), (1.0,))
	assert np.isfinite(float(val)) and np.isfinite(float(tangent))
	# d/ds tr-form of sqrt(sA): compare against finite differences
	eps = 1e-5
	fd = (f(1.0 + eps) - f(1.0 - eps)) / (2 * eps)
	assert abs(float(tangent) - float(fd)) < 1e-4 * max(1.0, abs(float(fd)))


def test_quad_grad_stable_under_clustered_ritz_values():
	"""RBF-style kernels give (near-)degenerate Ritz values; naive eigh
	gradients NaN there. The Daleckii-Krein custom JVP must stay finite and
	match tr(K^-1 dK) (regression for the spectral_quad_form derivative)."""
	n = 64
	rng = np.random.default_rng(0)
	X = rng.uniform(-2, 2, (n, 2))
	sq = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)

	def build(theta):
		return jnp.exp(-0.5 * jnp.asarray(sq) / jnp.exp(theta) ** 2) + 1e-3 * jnp.eye(n)

	def logdet_est(theta):
		K = build(theta)
		M = pt.MatrixFunction(K, fun="log", deg=24, orth=8)
		V = sample_isotropic(jax.random.PRNGKey(1), (n, 64), pdf="rademacher", dtype=jnp.float64)
		return jnp.mean(M.quad(V))

	g = float(jax.grad(logdet_est)(0.0))
	assert np.isfinite(g)
	# ground truth: d/dθ logdet K = tr(K⁻¹ dK/dθ)
	eps = 1e-5
	Kp, Km = np.asarray(build(eps), np.float64), np.asarray(build(-eps), np.float64)
	dK = (Kp - Km) / (2 * eps)
	K0 = np.asarray(build(0.0), np.float64)
	true = np.trace(np.linalg.solve(K0, dK))
	assert abs(g - true) / max(abs(true), 1.0) < 0.15, (g, true)


def test_differentiable_solve_grad():
	"""cg wraps custom_linear_solve: grad of yᵀK⁻¹y matches -yᵀK⁻¹ dK K⁻¹y."""
	n = 40
	B = jax.random.normal(jax.random.PRNGKey(2), (n, n), jnp.float64)

	def loss(theta):
		K = theta * jnp.eye(n) + B @ B.T / n
		y = jnp.arange(1.0, n + 1.0)
		return y @ pt.solve(K, y, rtol=1e-12)

	g = float(jax.grad(loss)(1.5))
	eps = 1e-6
	fd = (loss(1.5 + eps) - loss(1.5 - eps)) / (2 * eps)
	assert abs(g - float(fd)) / abs(float(fd)) < 1e-4
