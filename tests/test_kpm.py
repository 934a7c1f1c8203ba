"""Kernel Polynomial Method tests vs dense ground truth."""

import numpy as np
import scipy.sparse as sps
import jax.numpy as jnp

import primate_tpu as pt
from primate_tpu.kpm import chebyshev_moments, jackson_coefficients, kpm_density, kpm_trace


def _spd(n=96, seed=0, lo=0.5, hi=2.0):
	ew = np.random.default_rng(seed).uniform(lo, hi, n)
	return np.asarray(pt.symmetric(n, pd=True, ew=ew, seed=seed)), ew


def test_moment_identities():
	A, ew = _spd()
	n = len(ew)
	mus, (lo, hi) = chebyshev_moments(A, m=4, nv=64, seed=1)
	c, r = (hi + lo) / 2, (hi - lo) / 2
	# tr(T_0) = n exactly (rademacher probes have vᵀv = n); tr(T_1) = tr(Ã)
	assert abs(mus[0] - n) < 1e-6
	true_t1 = (ew - c).sum() / r
	assert abs(mus[1] - true_t1) < 0.15 * n


def test_kpm_logdet_matches_dense():
	A, ew = _spd()
	est = kpm_trace(A, fun="log", m=96, nv=64, seed=2)
	true = np.log(ew).sum()
	assert abs(est - true) / abs(true) < 0.1


def test_kpm_trace_identity_is_trace():
	A, ew = _spd(seed=3)
	est = kpm_trace(A, fun="identity", m=32, nv=64, seed=4)
	assert abs(est - ew.sum()) / ew.sum() < 0.1


def test_kpm_density_mass_and_location():
	A, ew = _spd(seed=5, lo=1.0, hi=1.2)  # narrow spectrum
	ts, phi = kpm_density(A, grid=400, m=128, nv=32, interval=(0.0, 2.0), seed=6)
	dt = ts[1] - ts[0]
	assert abs(phi.sum() * dt - 1.0) < 0.1  # unit mass
	in_band = (ts > 0.9) & (ts < 1.3)
	assert phi[in_band].sum() * dt > 0.8  # mass concentrated on the band


def test_kpm_on_sparse_operator():
	n = 256
	L = sps.diags([-np.ones(n - 1), 3.0 * np.ones(n), -np.ones(n - 1)], [-1, 0, 1])
	from primate_tpu.operators.sparse import DIAOperator

	op = DIAOperator.from_scipy(L)
	k = np.arange(1, n + 1)
	exact = float(np.sum(np.log(3.0 - 2.0 * np.cos(k * np.pi / (n + 1)))))
	est = kpm_trace(op, fun="log", m=96, nv=64, seed=7)
	assert abs(est - exact) / abs(exact) < 0.1


def test_jackson_coefficients_shape_and_decay():
	g = np.asarray(jackson_coefficients(50))
	assert g.shape == (50,)
	assert abs(g[0] - 1.0) < 1e-6 and g[-1] < 0.01 and np.all(np.diff(g) < 1e-9)


def test_chebyshev_function_matvec_matches_dense():
	"""ChebyshevFunction @ v ≈ dense f(A) v for smooth f at moderate degree."""
	A, ew = _spd(80, seed=2)
	evw, evv = np.linalg.eigh(A)
	v = np.random.default_rng(3).normal(size=80)
	for fun, f in (("exp", np.exp), ("identity", lambda x: x)):
		M = pt.ChebyshevFunction(A, fun=fun, deg=64, damping="none", seed=0)
		want = evv @ (f(evw) * (evv.T @ v))
		got = np.asarray(M @ v)
		assert np.allclose(got, want, atol=1e-4 * max(1.0, np.abs(want).max())), fun
	# batched block agrees with per-column
	V = np.random.default_rng(4).normal(size=(80, 5))
	M = pt.ChebyshevFunction(A, fun="exp", deg=64, damping="none", seed=0)
	B = np.asarray(M.matmat(V))
	for j in range(5):
		assert np.allclose(B[:, j], np.asarray(M @ V[:, j]), atol=1e-8)


def test_chebyshev_function_quad_matches_matvec():
	"""quad(v) ≡ vᵀ (M @ v): the forward-moment and Clenshaw paths evaluate the
	same damped approximant."""
	A, _ = _spd(64, seed=5)
	M = pt.ChebyshevFunction(A, fun="exp", deg=48, seed=0)
	V = np.random.default_rng(6).normal(size=(64, 4))
	q = np.asarray(M.quad(V))
	direct = np.einsum("ij,ij->j", V, np.asarray(M.matmat(V)))
	assert np.allclose(q, direct, rtol=1e-5, atol=1e-6)


def test_hutch_on_chebyshev_function_is_kpm():
	"""hutch(ChebyshevFunction(A, f)) estimates tr(f(A)) — adaptive KPM."""
	n = 256
	L = sps.diags([-np.ones(n - 1), 3.0 * np.ones(n), -np.ones(n - 1)], [-1, 0, 1])
	from primate_tpu.operators.sparse import DIAOperator

	op = DIAOperator.from_scipy(L)
	k = np.arange(1, n + 1)
	exact = float(np.sum(np.log(3.0 - 2.0 * np.cos(k * np.pi / (n + 1)))))
	M = pt.ChebyshevFunction(op, fun="log", deg=96, seed=7)
	est = pt.hutch(M, batch=64, converge="count", count=128, seed=11)
	assert abs(est - exact) / abs(exact) < 0.1


def test_kpm_trace_multi_function_shares_moments():
	"""A sequence of f's re-uses one moment sweep: member 0 == the single-f call."""
	A, ew = _spd(100, seed=9)
	ts = [0.5, 1.0, 2.0]
	funs = [(lambda t: (lambda x: np.exp(-t * x)))(t) for t in ts]
	ests = pt.kpm_trace(A, funs, m=96, nv=64, seed=1)
	gt = np.array([np.sum(np.exp(-t * ew)) for t in ts])
	assert ests.shape == (3,)
	assert np.allclose(ests, gt, rtol=0.1)
	e0 = pt.kpm_trace(A, funs[0], m=96, nv=64, seed=1)
	assert isinstance(e0, float) and np.isclose(e0, ests[0], rtol=1e-12)


def test_suggest_chebyshev_degree_decay():
	"""Analytic f: geometric coefficient decay → small degree; the suggested
	degree actually resolves f (KPM estimate within tolerance)."""
	from primate_tpu.kpm import suggest_chebyshev_degree

	m_exp = suggest_chebyshev_degree("exp", (0.0, 1.0), rtol=1e-8)
	assert 5 <= m_exp <= 40  # exp on [0,1] is entire — tiny expansion
	# a harder f on a wider interval needs (monotonically) more terms
	m_exp_wide = suggest_chebyshev_degree("exp", (0.0, 30.0), rtol=1e-8)
	assert m_exp_wide > m_exp
	# tighter tolerance never shrinks the degree
	assert suggest_chebyshev_degree("exp", (0.0, 1.0), rtol=1e-12) >= m_exp


def test_kpm_auto_degree_end_to_end():
	rng = np.random.default_rng(7)
	ew = rng.uniform(0.1, 2.0, 64)
	A = pt.symmetric(64, ew=ew, seed=9)
	est = pt.kpm_trace(A, "exp", m="auto", nv=64, seed=11)
	true = np.exp(ew).sum()
	assert abs(est - true) <= 0.05 * true
	# ChebyshevFunction deg="auto" — quad path through hutch
	M = pt.ChebyshevFunction(A, "exp", deg="auto", seed=13)
	assert M._deg >= 5
	est2 = pt.hutch(M, converge="count", count=256, seed=15)
	assert abs(est2 - true) <= 0.05 * true


def test_auto_degree_accounts_for_jackson_damping():
	"""Review r3c: deg='auto' under the default Jackson damping sizes against
	the DAMPED error (the kernel biases every retained coefficient), so the
	evaluated operator meets a ~1e-3 bar instead of the ~1e-2 it used to."""
	A = np.asarray(pt.symmetric(64, pd=True, ew=np.linspace(0.4, 2.1, 64), seed=0))
	v = np.random.default_rng(1).normal(size=64)
	w, U = np.linalg.eigh(A)
	truth = U @ (np.exp(w) * (U.T @ v))
	cf_j = pt.ChebyshevFunction(A, "exp", deg="auto", interval=(0.4, 2.1), damping="jackson")
	err_j = np.linalg.norm(np.asarray(cf_j @ jnp.asarray(v)) - truth) / np.linalg.norm(truth)
	assert err_j < 2e-3, (cf_j._deg, err_j)
	cf_n = pt.ChebyshevFunction(A, "exp", deg="auto", interval=(0.4, 2.1), damping="none")
	err_n = np.linalg.norm(np.asarray(cf_n @ jnp.asarray(v)) - truth) / np.linalg.norm(truth)
	assert cf_n._deg < cf_j._deg and err_n < 1e-6
