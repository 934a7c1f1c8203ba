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
