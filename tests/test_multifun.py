"""Stacked spectral functions: a family of f's sharing ONE Lanczos sweep.

The Gauss quadrature rule (and the Krylov basis) produced by a Lanczos sweep
is independent of the spectral function, so `special.stacked` families are
evaluated against the same nodes/weights — `tr(exp(-t·A))` at nt timepoints
costs the operator applications of one. The reference's serial analog is its
vector-valued `fun` support (`src/primate/operators.py:63-66,91-97`).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from primate_tpu import MatrixFunction, diag, hutch
from primate_tpu.integrate import spectral_quad_form
from primate_tpu.random import symmetric
from primate_tpu.recipes import estrada_index, heat_kernel_signature, heat_kernel_trace, schatten
from primate_tpu.special import stacked

TS = np.array([0.5, 1.0, 2.0])


@pytest.fixture(scope="module")
def fixture():
	n = 80
	ew = np.linspace(0.1, 2.0, n)
	A = np.asarray(symmetric(n, ew=ew, seed=0), np.float64)
	w, U = np.linalg.eigh(A)
	return A, w, U


def test_stacked_builtin_memoized():
	f1 = stacked("exp", TS)
	f2 = stacked("exp", TS)
	assert f1 is f2  # jit-cache friendly: same family -> same callable object
	assert f1.nout == len(TS)
	out = f1(jnp.ones((4, 6)))
	assert out.shape == (len(TS), 4, 6)


def test_stacked_quad_equals_per_function(fixture):
	A, w, U = fixture
	n = A.shape[0]
	X = jnp.asarray(np.random.default_rng(0).standard_normal((n, 8)))
	M = MatrixFunction(A, fun=stacked("exp", -TS), deg=30, orth=-1, dtype=np.float64)
	q = np.asarray(M.quad(X))
	assert q.shape == (len(TS), 8)
	for i, t in enumerate(TS):
		Mi = MatrixFunction(A, fun="exp", t=-float(t), deg=30, orth=-1, dtype=np.float64)
		# identical sweep -> identical Gauss rules -> exact agreement
		assert np.allclose(q[i], np.asarray(Mi.quad(X)), rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("two_pass", [False, True])
def test_stacked_matvec_matches_dense(fixture, two_pass):
	A, w, U = fixture
	n = A.shape[0]
	v = np.random.default_rng(1).standard_normal(n)
	M = MatrixFunction(A, fun=stacked("exp", -TS), deg=30, orth=-1, dtype=np.float64, two_pass=two_pass)
	y = np.asarray(M.matvec(jnp.asarray(v)))
	gt = np.stack([U @ (np.exp(-t * w) * (U.T @ v)) for t in TS])
	assert y.shape == (len(TS), n)
	assert np.allclose(y, gt, atol=1e-8)


def test_hutch_stacked_equals_per_function_same_seed(fixture):
	A, w, U = fixture
	M = MatrixFunction(A, fun=stacked("exp", -TS), deg=30, orth=-1, dtype=np.float64)
	est = hutch(M, batch=16, converge="count", count=400, seed=3)
	assert est.shape == (len(TS),)
	gt = np.array([np.sum(np.exp(-t * w)) for t in TS])
	assert np.allclose(est, gt, rtol=0.1)
	for i, t in enumerate(TS):
		Mi = MatrixFunction(A, fun="exp", t=-float(t), deg=30, orth=-1, dtype=np.float64)
		ei = hutch(Mi, batch=16, converge="count", count=400, seed=3)
		# same probes, same sweep -> bitwise-identical sample streams
		assert np.allclose(est[i], ei, rtol=1e-9)


def test_hutch_stacked_full_result(fixture):
	A, w, U = fixture
	M = MatrixFunction(A, fun=stacked("exp", -TS), deg=30, orth=-1, dtype=np.float64)
	est, result = hutch(M, batch=16, converge="count", count=128, seed=3, full=True)
	assert est.shape == (len(TS),)
	assert result.nit == 128


def test_diag_stacked_matches_dense(fixture):
	A, w, U = fixture
	n = A.shape[0]
	M = MatrixFunction(A, fun=stacked("exp", -TS), deg=30, orth=-1, dtype=np.float64)
	d = diag(M, converge="count", count=800, seed=5)
	gt = np.stack([np.einsum("ij,j,ij->i", U, np.exp(-t * w), U) for t in TS])
	assert d.shape == (len(TS), n)
	assert np.max(np.abs(d - gt)) < 0.1


def test_heat_kernel_trace_curve(fixture):
	A, w, U = fixture
	est = heat_kernel_trace(A, t=TS, deg=30, orth=-1, converge="count", count=400, seed=3)
	gt = np.array([np.sum(np.exp(-t * w)) for t in TS])
	assert np.allclose(est, gt, rtol=0.1)
	# scalar t keeps returning a scalar
	e0 = heat_kernel_trace(A, t=float(TS[0]), deg=30, orth=-1, converge="count", count=400, seed=3)
	assert np.isscalar(e0) or np.ndim(e0) == 0


def test_estrada_multi_t(fixture):
	A, w, U = fixture
	ts = np.array([0.25, 0.5])
	est = estrada_index(A, deg=30, orth=-1, t=ts, converge="count", count=400, seed=3)
	gt = np.array([np.sum(np.exp(t * w)) for t in ts])
	assert np.allclose(est, gt, rtol=0.1)


def test_heat_kernel_signature_fused(fixture):
	A, w, U = fixture
	n = A.shape[0]
	sig = heat_kernel_signature(A, TS, deg=30, orth=-1, converge="count", count=800, seed=5)
	gt = np.stack([np.einsum("ij,j,ij->i", U, np.exp(-t * w), U) for t in TS])
	assert sig.shape == (len(TS), n)
	assert np.max(np.abs(sig - gt)) < 0.1


def test_schatten_multi_p(fixture):
	A, w, U = fixture
	ps = np.array([1.0, 2.0, 4.0])
	est = schatten(A, p=ps, deg=30, orth=-1, converge="count", count=400, seed=3)
	gt = np.array([np.sum(np.abs(w) ** p) ** (1.0 / p) for p in ps])
	assert np.allclose(est, gt, rtol=0.1)


def test_stacked_quad_form_grad():
	ts = np.array([0.5, 1.5])
	f = stacked("exp", -ts)
	d = jnp.asarray(np.random.default_rng(0).uniform(1, 2, (4, 6)))
	e = jnp.asarray(np.random.default_rng(1).uniform(0.1, 0.5, (4, 5)))
	v = spectral_quad_form(d, e, f)
	assert v.shape == (2, 4)

	weights = jnp.arange(1.0, 3.0)[:, None]
	loss = lambda d, e: jnp.sum(spectral_quad_form(d, e, f) * weights)  # noqa: E731
	g = jax.grad(loss)(d, e)
	eps = 1e-6
	fd = (loss(d.at[2, 3].add(eps), e) - loss(d, e)) / eps
	assert abs(float(g[2, 3]) - float(fd)) < 1e-4


def test_stacked_record_rejected(fixture):
	A, w, U = fixture
	M = MatrixFunction(A, fun=stacked("exp", -TS), deg=10, orth=-1, dtype=np.float64)
	with pytest.raises(NotImplementedError):
		hutch(M, converge="count", count=64, record=True)


# ---- Chebyshev/KPM analog: the T_j recurrence is f-independent ----


def test_chebyshev_stacked_matvec_and_quad(fixture):
	import primate_tpu as pt

	A, w, U = fixture
	n = A.shape[0]
	fam = [(lambda t: (lambda x: np.exp(-t * x)))(t) for t in TS]
	C = pt.ChebyshevFunction(A, fun=fam, deg=64, damping="none")
	v = np.random.default_rng(3).standard_normal(n)
	y = np.asarray(C.matvec(jnp.asarray(v)))
	gt = np.stack([U @ (np.exp(-t * w) * (U.T @ v)) for t in TS])
	assert y.shape == (len(TS), n) and np.allclose(y, gt, atol=1e-6)

	X = jnp.asarray(np.random.default_rng(4).standard_normal((n, 8)))
	q = np.asarray(C.quad(X))
	assert q.shape == (len(TS), 8)
	for i, t in enumerate(TS):
		Ci = pt.ChebyshevFunction(A, fun="exp", t=-float(t), deg=64, damping="none", interval=C.interval)
		assert np.allclose(q[i], np.asarray(Ci.quad(X)), rtol=1e-9)
	# `special.stacked` callables produce the same coefficient rows
	C2 = pt.ChebyshevFunction(A, fun=stacked("exp", -TS), deg=64, damping="none", interval=C.interval)
	assert np.allclose(np.asarray(C2.quad(X)), q, rtol=1e-9)


def test_hutch_on_stacked_chebyshev_is_multi_kpm(fixture):
	import primate_tpu as pt

	A, w, U = fixture
	fam = [(lambda t: (lambda x: np.exp(-t * x)))(t) for t in TS]
	C = pt.ChebyshevFunction(A, fun=fam, deg=64, damping="none")
	est = pt.hutch(C, batch=16, converge="count", count=400, seed=7)
	gt = np.array([np.sum(np.exp(-t * w)) for t in TS])
	assert est.shape == (len(TS),) and np.allclose(est, gt, rtol=0.1)


def test_record_with_single_member_stack(fixture):
	"""dim == 1 stacked functions still support recording (knee criteria)."""
	A, w, U = fixture
	M = MatrixFunction(A, fun=stacked("exp", [-1.0]), deg=20, orth=-1, dtype=np.float64)
	est, res = hutch(M, batch=8, converge="count", count=64, record=True, seed=1, full=True)
	assert est.shape == (1,)
	vals = np.asarray(res.estimator.values)
	assert vals.shape[0] == 64 and np.all(np.isfinite(vals))


def test_kpm_trace_single_member_stack_returns_array(fixture):
	import primate_tpu as pt

	A, w, U = fixture
	est = pt.kpm_trace(A, stacked("exp", [-1.0]), m=64, nv=32, seed=1)
	assert np.asarray(est).shape == (1,)


def test_hutch_stacked_default_criterion_message(fixture):
	"""The default (count | confidence) criterion must evaluate and message
	cleanly on a stacked estimator (dim > 1 Welford state)."""
	A, w, U = fixture
	M = MatrixFunction(A, fun=stacked("exp", -TS), deg=20, orth=-1, dtype=np.float64)
	est, res = hutch(M, batch=16, seed=3, full=True)
	assert est.shape == (len(TS),) and isinstance(res.message, str)
