"""Edge shapes and degenerate inputs: the reference's validation/clamping rules."""

import numpy as np
import pytest
import jax.numpy as jnp

import primate_tpu as pt


def test_lanczos_deg_one():
	A = pt.symmetric(8, pd=True, seed=0)
	a, b = pt.lanczos(A, deg=1)
	assert np.asarray(a).shape == (1,) and np.asarray(b).shape == (0,)


def test_lanczos_deg_clamped_to_n():
	A = pt.symmetric(6, pd=True, seed=1)
	a, b = pt.lanczos(A, deg=100, orth=-1)  # deg clamps to n
	assert np.asarray(a).shape == (6,)
	ew = np.linalg.eigvalsh(np.asarray(A))
	assert np.allclose(np.sort(np.asarray(pt.eigvalsh_tridiag(a, b))), ew, atol=1e-8)


def test_lanczos_rejects_bad_v0():
	A = pt.symmetric(8, seed=2)
	with pytest.raises(AssertionError):
		pt.lanczos(A, v0=np.ones(5))


def test_hutch_single_probe_batch():
	A = pt.symmetric(16, pd=True, seed=3)
	est = pt.hutch(A, batch=1, converge="count", count=64, seed=4)
	assert np.isfinite(est)


def test_hutch_tiny_matrix():
	A = jnp.asarray([[2.0]])
	est = pt.hutch(A, converge="count", count=16, seed=5)
	assert abs(est - 2.0) < 1e-6  # 1x1: every quadratic form is exact


def test_xtrace_batch_larger_than_n():
	A = pt.symmetric(10, pd=True, seed=6)
	est = pt.xtrace(A, batch=64, seed=7)  # clamps to n columns
	assert abs(est - float(jnp.trace(jnp.asarray(A)))) < 1e-6


def test_diag_tiny():
	A = pt.symmetric(4, pd=True, seed=8)
	d = pt.diag(A, seed=9, converge="count", count=400)
	assert np.allclose(np.asarray(d), np.diag(np.asarray(A)), atol=0.3)


def test_matrix_function_min_degree():
	A = pt.symmetric(12, pd=True, seed=10)
	M = pt.MatrixFunction(A, fun="identity", deg=2, orth=-1)
	v = np.random.default_rng(0).normal(size=12)
	out = np.asarray(M @ v)
	assert np.all(np.isfinite(out))
	with pytest.raises(AssertionError):
		pt.MatrixFunction(A, deg=1)


def test_quadrature_single_node():
	nodes, weights = pt.quadrature(jnp.asarray([2.0]), jnp.zeros(0), deg=1)
	assert np.allclose(np.asarray(nodes), [2.0]) and np.allclose(np.asarray(weights), [1.0])


def test_mean_estimator_empty():
	est = pt.MeanEstimator()
	assert est.n_samples == 0
	assert np.isnan(est.estimate)


def test_hutchpp_small_m():
	A = pt.symmetric(30, pd=True, seed=11)
	est = pt.hutchpp(A, m=3, seed=12)
	assert np.isfinite(est)
