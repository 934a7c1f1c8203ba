"""DIA (banded/stencil) operator + fused Pallas stencil kernel tests."""

import numpy as np
import pytest
import jax.numpy as jnp
import scipy.sparse as sps

import primate_tpu as pt
from primate_tpu.operators.sparse import DIAOperator
from primate_tpu.ops.dia_pallas import dia_matmat


def _banded(n: int, offsets, seed: int) -> sps.dia_matrix:
	rng = np.random.default_rng(seed)
	diags = [rng.normal(size=n - abs(o)) for o in offsets]
	return sps.diags(diags, offsets)


@pytest.mark.parametrize("offsets", [[-1, 0, 1], [-5, -1, 0, 1, 5], [0, 3], [-2, 0]])
def test_dia_matmat_matches_scipy(offsets):
	n = 150
	A = _banded(n, offsets, seed=1)
	op = DIAOperator.from_scipy(A)
	V = np.random.default_rng(2).normal(size=(n, 6))
	assert np.allclose(np.asarray(op.matmat(jnp.asarray(V))), A @ V)
	v = V[:, 0]
	assert np.allclose(np.asarray(op.rmatvec(jnp.asarray(v))), A.T @ v)
	assert np.allclose(np.asarray(op.todense()), A.toarray())


def test_dia_pallas_matches_jnp():
	n = 300
	A = _banded(n, [-7, -1, 0, 1, 7], seed=3)
	op = DIAOperator.from_scipy(A)
	V = jnp.asarray(np.random.default_rng(4).normal(size=(n, 128)))  # lane-aligned
	got = dia_matmat(op, V, interpret=True)
	want = op._matmat_jnp(V)
	assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-10)


def test_dia_pallas_requires_lane_aligned_probes():
	import pytest

	op = DIAOperator.from_scipy(_banded(64, [-1, 0, 1], seed=5))
	with pytest.raises(NotImplementedError, match="128"):
		dia_matmat(op, jnp.ones((64, 5)), interpret=True)
	# dispatch silently falls back to the XLA path for partial-lane blocks
	V = jnp.asarray(np.random.default_rng(6).normal(size=(64, 5)))
	assert np.allclose(np.asarray(op.matmat(V)), np.asarray(op._matmat_jnp(V)))


def test_hutch_on_dia_laplacian():
	n = 256
	main = 3.0 * np.ones(n)
	off = -1.0 * np.ones(n - 1)
	A = sps.diags([off, main, off], [-1, 0, 1])
	op = DIAOperator.from_scipy(A)
	est = pt.hutch(op, seed=7, converge="count", count=512)
	assert abs(est - 3.0 * n) < 10 / np.sqrt(n) * 30  # tr = 3n


def test_slq_logdet_on_dia():
	n = 256
	main = 3.0 * np.ones(n)
	off = -1.0 * np.ones(n - 1)
	A = sps.diags([off, main, off], [-1, 0, 1])
	op = DIAOperator.from_scipy(A)
	M = pt.MatrixFunction(op, fun="log", deg=30, orth=30)
	est = pt.hutch(M, seed=8, converge="count", count=256, batch=32)
	k = np.arange(1, n + 1)
	exact = float(np.sum(np.log(3.0 - 2.0 * np.cos(k * np.pi / (n + 1)))))
	assert abs(est - exact) / abs(exact) < 0.05


def test_dia_pallas_probe_major_matches_jnp():
	"""Probe-major double-buffered stencil kernel ≡ the XLA matmat_t path."""
	from primate_tpu.ops.dia_pallas import dia_matmat_t

	n = 300
	A = _banded(n, [-7, -1, 0, 1, 7], seed=7)
	op = DIAOperator.from_scipy(A)
	Xt = jnp.asarray(np.random.default_rng(8).normal(size=(13, n)))  # odd probe count on sublanes
	got = dia_matmat_t(op, Xt, interpret=True)
	want = op.matmat_t(Xt)
	assert got.shape == (13, n)
	assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-10)


def test_dia_pallas_probe_major_wide_band_rejected():
	from primate_tpu.ops.dia_pallas import dia_matmat_t

	op = DIAOperator.from_scipy(_banded(600, [-200, 0, 200], seed=9))
	with pytest.raises(NotImplementedError, match="128"):
		dia_matmat_t(op, jnp.ones((4, 600)), interpret=True)


def test_dia_use_pallas_routes_matmat_t():
	"""use_pallas=True matmat_t goes through the probe-major kernel (interpret
	mode auto-selected off-TPU) and agrees with the XLA path; bands wider than
	the kernel halo fall back instead of raising."""
	op = DIAOperator.from_scipy(_banded(256, [-1, 0, 1], seed=10))
	op_k = DIAOperator(op.bands, op.offsets, op.shape, use_pallas=True)
	Xt = jnp.asarray(np.random.default_rng(11).normal(size=(8, 256)))
	assert np.allclose(np.asarray(op_k.matmat_t(Xt)), np.asarray(op.matmat_t(Xt)), atol=1e-10)
	# wide band: |offset| > 128 routes to the node-major kernel, not an error
	wide = DIAOperator.from_scipy(_banded(600, [-200, 0, 200], seed=9))
	wide_k = DIAOperator(wide.bands, wide.offsets, wide.shape, use_pallas=True)
	Xw = jnp.asarray(np.random.default_rng(12).normal(size=(4, 600)))
	assert np.allclose(np.asarray(wide_k.matmat_t(Xw)), np.asarray(wide.matmat_t(Xw)), atol=1e-10)
