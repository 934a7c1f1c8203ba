"""High-level recipe functions vs dense ground truth."""

import numpy as np
import pytest
import scipy.sparse as sps
import jax.numpy as jnp

import primate_tpu as pt
from primate_tpu import recipes


def _spd(n=64, seed=0, lo=0.5, hi=2.0):
	ew = np.random.default_rng(seed).uniform(lo, hi, n)
	A = np.asarray(pt.symmetric(n, pd=True, ew=ew, seed=seed))
	return A, ew


def test_logdet():
	A, ew = _spd()
	est = recipes.logdet(A, deg=40, orth=-1, converge="count", count=256, seed=1)
	assert abs(est - np.log(ew).sum()) / abs(np.log(ew).sum()) < 0.15


def test_trace_inv():
	A, ew = _spd()
	est = recipes.trace_inv(A, deg=40, orth=-1, converge="count", count=256, seed=2)
	assert abs(est - (1 / ew).sum()) / (1 / ew).sum() < 0.1


def test_heat_kernel_and_estrada():
	A, ew = _spd()
	est = recipes.heat_kernel_trace(A, t=0.5, deg=40, orth=-1, converge="count", count=256, seed=3)
	true = np.exp(-0.5 * ew).sum()
	assert abs(est - true) / true < 0.1
	est2 = recipes.estrada_index(A, deg=40, orth=-1, converge="count", count=256, seed=4)
	true2 = np.exp(ew).sum()
	assert abs(est2 - true2) / true2 < 0.1


def test_numrank_and_eigencount():
	n = 60
	ew = np.r_[np.zeros(20), np.random.default_rng(5).uniform(0.5, 1.0, n - 20)]
	A = np.asarray(pt.symmetric(n, ew=ew, seed=5))
	r = recipes.numrank(A, threshold=1e-2, deg=40, orth=-1, converge="count", count=512, seed=6)
	assert abs(r - (n - 20)) <= 3
	c = recipes.eigencount(A, (0.4, 1.01), deg=40, orth=-1, converge="count", count=512, seed=7)
	assert abs(c - (n - 20)) <= 3


def test_schatten_psd_and_gram():
	A, ew = _spd(n=48, seed=8)
	est = recipes.schatten(A, p=2.0, deg=40, orth=-1, converge="count", count=256, seed=9)
	true = (ew**2).sum() ** 0.5
	assert abs(est - true) / true < 0.1
	# rectangular data via the Gram trick: Schatten-2 = Frobenius norm
	X = np.random.default_rng(10).normal(size=(40, 24))
	est2 = recipes.schatten(jnp.asarray(X), p=2.0, deg=24, orth=-1, gram=True, converge="count", count=512, seed=11)
	true2 = np.linalg.norm(X, "fro")
	assert abs(est2 - true2) / true2 < 0.1


def test_heat_kernel_signature_shape():
	n = 40
	L = sps.diags([-np.ones(n - 1), 2.0 * np.ones(n), -np.ones(n - 1)], [-1, 0, 1]).toarray()
	hks = recipes.heat_kernel_signature(jnp.asarray(L), [0.1, 1.0], deg=20, orth=5, converge="count", count=200, seed=12)
	assert hks.shape == (2, n)
	true = np.stack([np.diag(__import__("scipy").linalg.expm(-t * L)) for t in (0.1, 1.0)])
	assert np.abs(hks - true).mean() < 0.25


def test_trace_inv_cg_backend():
	"""Hutchinson over preconditioned CG solves: unbiased to solve tolerance,
	and identical probes make it agree with SLQ at high degree."""
	import primate_tpu as pt
	from primate_tpu.solvers import nystrom_precond

	n = 200
	ew = np.concatenate([np.geomspace(100, 5, 8), np.random.default_rng(0).uniform(0.5, 2.0, n - 8)])
	A = np.asarray(pt.symmetric(n, pd=True, ew=ew, seed=1), np.float64)
	gt = float(np.sum(1.0 / ew))
	P = nystrom_precond(A, rank=16, seed=5)
	est_cg = recipes.trace_inv(A, method="cg", precond=P, rtol=1e-10, converge="count", count=256, seed=2)
	assert abs(est_cg - gt) / gt < 0.05
	est_slq = recipes.trace_inv(A, deg=60, orth=-1, converge="count", count=256, seed=2)
	# same probe stream, both solvers converged -> near-identical estimates
	assert np.isclose(est_cg, est_slq, rtol=1e-6)


def test_trace_bounds_brackets_logdet_quadrature():
	"""trace_bounds: lower <= upper, both near truth, and the bracket holds the
	exact probe-sample mean of v^T log(A) v (quadrature-bias control)."""
	from primate_tpu.random import as_key, sample_isotropic
	from primate_tpu.recipes import trace_bounds

	rng = np.random.default_rng(3)
	n, nv = 90, 48
	ew = rng.uniform(0.5, 4.0, n)
	A = np.asarray(pt.symmetric(n, pd=True, ew=ew, seed=4), np.float64)
	res = trace_bounds(A, "log", deg=12, nv=nv, seed=11, full=True)
	assert res["lower"] <= res["upper"] + 1e-12
	# The bracket holds the exact sample mean of the quadratic forms.
	lam, U = np.linalg.eigh(A)
	fA = U @ np.diag(np.log(lam)) @ U.T
	V = np.asarray(sample_isotropic(as_key(11), (n, nv), pdf="rademacher", dtype=np.float64))
	sample_mean = float(np.einsum("ij,ij->j", V, fA @ V).mean())
	assert res["lower"] - 1e-8 <= sample_mean <= res["upper"] + 1e-8
	# And the whole thing sits within MC error of the true logdet.
	true = float(np.log(ew).sum())
	assert abs(res["rules"]["gauss"] - true) < 5 * res["mc_stderr"] + 1e-6


def test_trace_bounds_kind_inference_and_custom():
	from primate_tpu.recipes import trace_bounds

	rng = np.random.default_rng(5)
	n = 60
	ew = rng.uniform(0.4, 2.0, n)
	A = np.asarray(pt.symmetric(n, pd=True, ew=ew, seed=6), np.float64)
	lo, hi = trace_bounds(A, "inv", deg=16, nv=32, seed=1)
	assert lo <= hi
	lo_e, hi_e = trace_bounds(A, "exp", deg=10, nv=32, seed=1)
	assert lo_e <= hi_e
	# Custom callables must state their derivative-sign class.
	import pytest

	with pytest.raises(ValueError, match="derivative-sign class"):
		trace_bounds(A, lambda x: x**0.5, deg=8, nv=8, seed=0)
	lo_s, hi_s = trace_bounds(A, "sqrt", deg=10, nv=32, seed=2)
	assert lo_s <= hi_s


def test_trace_bounds_sharded_matches_single_device():
	"""trace_bounds runs unchanged over sharded operators (same-seed equality)."""
	import scipy.sparse as sps
	from primate_tpu.operators.sparse import DIAOperator
	from primate_tpu.parallel import make_mesh, shard_operator
	from primate_tpu.recipes import trace_bounds

	n = 512
	L = sps.diags([-np.ones(n - 1), 3 * np.ones(n), -np.ones(n - 1)], [-1, 0, 1]).todia()
	dia = DIAOperator.from_scipy(L, engine="scipy")
	lo, hi = trace_bounds(dia, "log", deg=14, nv=16, seed=0)
	lam = 3 - 2 * np.cos(np.pi * np.arange(1, n + 1) / (n + 1))
	assert lo <= hi
	# Bracket sits within MC reach of the true logdet.
	assert abs(0.5 * (lo + hi) - float(np.log(lam).sum())) < 25.0

	mesh = make_mesh((8,), axis_names=("op",))
	sharded = shard_operator(dia, mesh)
	lo_s, hi_s = trace_bounds(sharded, "log", deg=14, nv=16, seed=0)
	assert abs(lo - lo_s) < 1e-6 and abs(hi - hi_s) < 1e-6


def test_trace_bounds_gram_path():
	"""trace_bounds on a GramOperator routes through GKL (+ the extra adjoint
	apply for the Radau coupling) and still brackets the probe-sample mean."""
	import jax.numpy as jnp
	from primate_tpu.operators.sparse import GramOperator
	from primate_tpu.random import as_key, sample_isotropic
	from primate_tpu.recipes import trace_bounds

	rng = np.random.default_rng(0)
	X = rng.normal(size=(90, 60)) + 2 * np.eye(90, 60)
	G = GramOperator(jnp.asarray(X))
	res = trace_bounds(G, "log", deg=14, nv=32, seed=2, full=True)
	assert res["lower"] <= res["upper"]
	lam, Q = np.linalg.eigh(X.T @ X)
	flog = (Q * np.log(lam)) @ Q.T
	V = np.asarray(sample_isotropic(as_key(2), (60, 32), pdf="rademacher", dtype=np.float64))
	sm = float(np.einsum("ij,ij->j", V, flog @ V).mean())
	assert res["lower"] - 1e-8 <= sm <= res["upper"] + 1e-8


def test_bilinear_form_entries_match_dense():
	"""u f(A) v via polarization ≡ dense f(A) entries (Golub-Meurant)."""
	rng = np.random.default_rng(0)
	n = 48
	ew = rng.uniform(0.5, 2.0, n)
	A = pt.symmetric(n, ew=ew, pd=True, seed=1)
	lam, Q = np.linalg.eigh(np.asarray(A))
	for fun, f in [("exp", np.exp), ("log", np.log), ("inv", lambda x: 1 / x)]:
		FA = (Q * f(lam)) @ Q.T
		U = rng.normal(size=(n, 5))
		V = rng.normal(size=(n, 5))
		got = recipes.bilinear_form(A, U, V, fun=fun, deg=n, orth=n)
		want = np.einsum("ij,ij->j", U, FA @ V)
		assert np.allclose(got, want, atol=1e-8), fun


def test_bilinear_form_single_vector_and_quadratic():
	rng = np.random.default_rng(3)
	n = 40
	A = pt.symmetric(n, pd=True, seed=5)
	lam, Q = np.linalg.eigh(np.asarray(A))
	expA = (Q * np.exp(lam)) @ Q.T
	# individual entry f(A)[i, j] via basis vectors
	ei, ej = np.eye(n)[:, 7], np.eye(n)[:, 19]
	got = recipes.bilinear_form(A, ei, ej, fun="exp", deg=n, orth=n)
	assert np.ndim(got) == 0 or np.shape(got) == ()
	assert np.isclose(float(got), expA[7, 19], atol=1e-8)
	# V=None → quadratic form path, equals u f(A) u
	u = rng.normal(size=n)
	gq = recipes.bilinear_form(A, u, fun="exp", deg=n, orth=n)
	assert np.isclose(float(gq), u @ expA @ u, rtol=1e-8)
	# consistency: bilinear with V=u agrees with the quadratic path
	gb = recipes.bilinear_form(A, u, u, fun="exp", deg=n, orth=n)
	assert np.isclose(float(gb), float(gq), rtol=1e-6)


def test_weighted_trace_plain_and_matrix_function():
	rng = np.random.default_rng(7)
	n = 64
	A = pt.symmetric(n, pd=True, ew=rng.uniform(0.5, 1.5, n), seed=11)
	Ad = np.asarray(A)
	B = rng.normal(size=(n, n))
	B = (B + B.T) / 2
	# fun=None: tr(A B) without any Lanczos sweep
	est = recipes.weighted_trace(Ad, B, converge="count", count=4096, seed=0, batch=64)
	true = np.trace(Ad @ B)
	assert abs(est - true) <= 0.05 * np.abs(np.linalg.eigvalsh(Ad @ B)).sum() + 0.5
	# fun="inv": tr(A^{-1} B)
	lam, Q = np.linalg.eigh(Ad)
	invA = (Q / lam) @ Q.T
	true_inv = np.trace(invA @ B)
	est_inv = recipes.weighted_trace(Ad, B, fun="inv", deg=32, orth=8, converge="count", count=4096, seed=1, batch=64)
	assert abs(est_inv - true_inv) <= 0.05 * np.abs(np.linalg.eigvalsh(invA @ B)).sum() + 0.5


def test_weighted_trace_diagonal_weights():
	"""1-D B = diag weights: tr(f(A) diag(w)) = sum_i w_i f(A)_ii."""
	rng = np.random.default_rng(9)
	n = 50
	A = pt.symmetric(n, pd=True, seed=13)
	lam, Q = np.linalg.eigh(np.asarray(A))
	expA = (Q * np.exp(lam)) @ Q.T
	w = rng.uniform(0.0, 2.0, n)
	true = float(np.sum(w * np.diag(expA)))
	est = recipes.weighted_trace(A, w, fun="exp", deg=n, orth=n, converge="count", count=4096, seed=2, batch=64)
	# rademacher variance here comes only from off-diagonal mass of diag(w) expA
	assert abs(est - true) / abs(true) < 0.1


@pytest.mark.slow
def test_suggest_degree_converges_and_is_monotone():
	rng = np.random.default_rng(21)
	n = 300
	ew = rng.uniform(0.05, 3.0, n)
	A = pt.symmetric(n, ew=ew, pd=True, seed=22)
	deg, hist = recipes.suggest_degree(A, "log", rtol=1e-3, nv=8, deg0=4, seed=3, full=True)
	gaps = [h["gap"] for h in hist]
	assert all(g1 >= g2 * 0.5 for g1, g2 in zip(gaps, gaps[1:])) or gaps[-1] < gaps[0]
	lo, hi = hist[-1]["lower"], hist[-1]["upper"]
	assert hi - lo <= 1e-3 * abs(0.5 * (lo + hi)) * 1.0001
	# the suggested degree actually delivers the accuracy on the true logdet:
	true = np.log(ew).sum()
	est = recipes.logdet(A, deg=deg, orth=-1, converge="count", count=512, seed=5)
	assert abs(est - true) / abs(true) < 0.05  # MC error now dominates, not bias


def test_suggest_degree_caps():
	A = pt.symmetric(64, pd=True, seed=30)
	deg, hist = recipes.suggest_degree(A, "log", rtol=0.0, atol=0.0, deg0=8, max_deg=32, nv=4, seed=0, full=True)
	assert deg <= 32  # unreachable tolerance stops at max_deg
	assert hist[-1]["deg"] == deg
	# exp converges spectrally fast: small degree suffices
	d2 = recipes.suggest_degree(A, "exp", rtol=1e-6, deg0=8, nv=4, seed=1)
	assert d2 <= 32


def test_suggest_probes_bound():
	"""A-priori mode reproduces the documented (24/eps^2)·log(2/eta) bound."""
	nv = pt.recipes.suggest_probes(eps=0.1, eta=0.05, method="bound")
	assert nv == int(np.ceil((24 / 0.1**2) * np.log(2 / 0.05)))
	nv2, info = pt.recipes.suggest_probes(eps=0.5, eta=0.5, full=True)  # no A -> bound
	assert info["method"] == "bound" and nv2 >= 1


def test_suggest_probes_clt_sizes_to_target():
	"""Measured mode: a follow-up run with the suggested nv lands its CI
	half-width near eps·|tr| (the sizing identity, checked empirically)."""
	rng = np.random.default_rng(5)
	ew = rng.uniform(0.5, 2.0, 64)
	A = pt.symmetric(64, pd=True, ew=ew, seed=7)
	eps, eta = 0.02, 0.05
	nv, info = pt.recipes.suggest_probes(A, eps=eps, eta=eta, pilot=64, seed=11, full=True)
	assert info["method"] == "clt" and nv >= 64
	# empirical check: run nv probes, margin of error should be ~eps·|tr|
	_, res = pt.hutch(A, converge="count", count=nv, batch=min(nv, 256), seed=13, full=True)
	est = pt.ConfidenceEstimator(confidence=1 - eta)
	est._moments = res.estimator._moments
	# within 3x of the target (variance of the pilot's variance estimate)
	assert est.margin_of_error <= 3 * eps * ew.sum()
	# and the estimate itself is inside the advertised relative tolerance band
	assert abs(float(np.asarray(res.estimator.estimate)) - ew.sum()) <= 3 * eps * ew.sum()


def test_suggest_probes_chi2_bound_is_conservative():
	"""The default χ² upper-confidence sizing always suggests at least as many
	probes as the point-estimate sizing, converging as the pilot grows."""
	rng = np.random.default_rng(29)
	ew = rng.uniform(0.5, 2.0, 64)
	A = pt.symmetric(64, pd=True, ew=ew, seed=31)
	nv_c, info_c = pt.recipes.suggest_probes(A, eps=0.02, pilot=16, seed=37, full=True)
	nv_p, info_p = pt.recipes.suggest_probes(A, eps=0.02, pilot=16, seed=37, full=True, conservative=False)
	assert info_c["variance_bound"] > info_c["variance"]  # strict at m=16
	assert info_p["variance_bound"] == info_p["variance"]
	assert nv_c >= nv_p
	# the inflation factor (m−1)/χ²_{eta,m−1} shrinks toward 1 with pilot size
	_, info_big = pt.recipes.suggest_probes(A, eps=0.02, pilot=256, seed=37, full=True)
	assert info_big["variance_bound"] / info_big["variance"] < info_c["variance_bound"] / info_c["variance"]


def test_suggest_probes_matrix_function():
	"""fun= wraps in MatrixFunction exactly as the trace recipes do."""
	rng = np.random.default_rng(17)
	ew = rng.uniform(0.5, 2.0, 48)
	A = pt.symmetric(48, pd=True, ew=ew, seed=19)
	nv = pt.recipes.suggest_probes(A, "log", eps=0.1, pilot=16, deg=24, seed=23)
	assert isinstance(nv, int) and nv >= 16


def test_shifted_trace_logdet_curve():
	"""tr(log(A + tI)) over a shift grid from one sweep matches dense truth,
	and the curve is monotone increasing in t (as log det must be)."""
	rng = np.random.default_rng(31)
	ew = rng.uniform(0.5, 2.0, 64)
	A = pt.symmetric(64, pd=True, ew=ew, seed=37)
	ts = np.asarray([0.0, 0.5, 1.0, 2.0])
	curve = pt.recipes.shifted_trace(A, "log", shifts=ts, deg=24, orth=-1, converge="count", count=256, seed=41)
	true = np.asarray([np.log(ew + t).sum() for t in ts])
	assert curve.shape == (4,)
	assert np.max(np.abs(np.asarray(curve) - true)) <= 0.05 * np.abs(true).max()
	assert np.all(np.diff(np.asarray(curve)) > 0)


def test_shifted_trace_shares_probes():
	"""Same seed, different grids: overlapping shifts agree EXACTLY (one sweep,
	shared probes — the correlated-curve property the docstring promises)."""
	A = pt.symmetric(48, pd=True, seed=43)
	a = pt.recipes.shifted_trace(A, "log", shifts=[1.0, 2.0], deg=16, converge="count", count=64, seed=47)
	b = pt.recipes.shifted_trace(A, "log", shifts=[1.0, 3.0], deg=16, converge="count", count=64, seed=47)
	assert float(a[0]) == float(b[0])


def test_shifted_trace_unhashable_callable():
	"""An unhashable f (defines __eq__, no __hash__) skips the memo cache
	instead of raising TypeError inside lru_cache."""

	class SqrtLike:
		def __eq__(self, other):
			return self is other

		__hash__ = None

		def __call__(self, x):
			return jnp.log(x)

	ew = np.random.default_rng(5).uniform(0.5, 2.0, 48)
	A = pt.symmetric(48, pd=True, ew=ew, seed=53)
	curve = pt.recipes.shifted_trace(A, SqrtLike(), shifts=[0.0, 1.0], deg=20, orth=-1, converge="count", count=256, seed=5)
	true = np.asarray([np.log(ew).sum(), np.log(ew + 1.0).sum()])
	assert np.max(np.abs(np.asarray(curve) - true)) <= 0.05 * np.abs(true).max()


def test_topk_projector():
	"""topk: P is the top-k eigenspace projector — idempotent, trace k, and
	P @ x matches the dense eigh-built projector (docs/src/table.qmd:18)."""
	rng = np.random.default_rng(11)
	ew = np.sort(rng.uniform(0.1, 1.0, 80))
	ew[-3:] = [5.0, 6.0, 7.0]  # well-separated top eigenspace
	A = np.asarray(pt.symmetric(80, ew=ew, seed=13))
	P, vals, V = pt.recipes.topk(A, k=3, which="LM", return_eigenvectors=True, seed=17)
	assert np.allclose(np.sort(vals), [5.0, 6.0, 7.0], atol=1e-4)
	w, U = np.linalg.eigh(A)
	Pd = U[:, -3:] @ U[:, -3:].T
	x = rng.standard_normal(80)
	assert np.allclose(np.asarray(P @ x), Pd @ x, atol=1e-4)
	assert np.allclose(np.asarray(P @ (P @ x)), np.asarray(P @ x), atol=1e-5)  # idempotent
	tr = float(np.trace(np.asarray(P @ np.eye(80))))
	assert abs(tr - 3.0) < 1e-4


def test_pagerank_resolvent():
	"""pagerank: (1−α)(I − αA)⁻¹v on a symmetric normalized adjacency matches
	the dense solve; block personalization solves all columns in one CG loop."""
	rng = np.random.default_rng(19)
	n = 60
	W = sps.random(n, n, density=0.1, random_state=7, data_rvs=lambda s: rng.uniform(0.5, 1.0, s))
	W = W + W.T
	W.setdiag(0)
	W.eliminate_zeros()
	d = np.asarray(W.sum(axis=1)).ravel()
	d[d == 0] = 1.0
	Dinv = sps.diags(1.0 / np.sqrt(d))
	A = (Dinv @ W @ Dinv).tocsr()
	alpha = 0.85
	x = np.asarray(pt.recipes.pagerank(A, alpha=alpha))
	dense = np.linalg.solve(np.eye(n) - alpha * A.toarray(), np.full(n, 1.0 / n)) * (1 - alpha)
	assert np.allclose(x, dense, atol=1e-6)
	# block of personalization vectors
	Vs = np.eye(n, 3)
	Xb = np.asarray(pt.recipes.pagerank(A, alpha=alpha, v=jnp.asarray(Vs, jnp.float32)))
	dense_b = np.linalg.solve(np.eye(n) - alpha * A.toarray(), Vs) * (1 - alpha)
	assert np.allclose(Xb, dense_b, atol=1e-5)


def test_effective_dim_curve_shares_sweeps():
	"""tr(A(A+λI)^{-1}) over a λ grid, one stacked-sweep estimate per point."""
	rng = np.random.default_rng(0)
	n = 150
	ew = np.sort(rng.uniform(0.01, 5.0, n))
	A = pt.symmetric(n, pd=True, ew=ew, seed=1)
	lams = np.array([0.01, 0.1, 1.0, 10.0])
	true = np.array([(ew / (ew + lam)).sum() for lam in lams])
	est = np.asarray(pt.recipes.effective_dim(A, lams, deg=40, orth=-1, converge="count", count=256, seed=2))
	assert est.shape == (4,)
	assert np.all(np.abs(est - true) / true < 0.01)
	# Monotone decreasing in λ, like the exact curve.
	assert np.all(np.diff(est) < 0)
	# Scalar λ path agrees with the dense value too.
	e1 = float(pt.recipes.effective_dim(A, 0.5, deg=40, orth=-1, converge="count", count=256, seed=2))
	assert abs(e1 - (ew / (ew + 0.5)).sum()) / (ew / (ew + 0.5)).sum() < 0.01


def test_condition_number():
	rng = np.random.default_rng(3)
	ew = np.sort(rng.uniform(0.05, 8.0, 120))
	A = pt.symmetric(120, pd=True, ew=ew, seed=4)
	k = pt.recipes.condition_number(A, seed=5, method="trlan")
	assert abs(k - ew[-1] / ew[0]) / (ew[-1] / ew[0]) < 1e-6
	# Indefinite operators are rejected (κ₂ needs singular values there).
	B = pt.symmetric(60, ew=np.linspace(-1, 2, 60), seed=6)
	with pytest.raises(ValueError):
		pt.recipes.condition_number(B, seed=7)


def test_slogdet_indefinite():
	rng = np.random.default_rng(0)
	# Odd number of negative eigenvalues → negative determinant sign.
	ew = np.sort(np.concatenate([rng.uniform(-3, -0.5, 7), rng.uniform(0.5, 3, 93)]))
	A = pt.symmetric(100, ew=ew, seed=1)
	(s, ld) = pt.recipes.slogdet(A, deg=40, orth=-1, converge="count", count=512, seed=2)
	s_t, ld_t = np.linalg.slogdet(np.asarray(A))
	assert s == s_t
	assert abs(ld - ld_t) / abs(ld_t) < 0.02
	# Even count → positive sign.
	ew2 = np.sort(np.concatenate([rng.uniform(-3, -0.5, 8), rng.uniform(0.5, 3, 92)]))
	A2 = pt.symmetric(100, ew=ew2, seed=3)
	(s2, ld2) = pt.recipes.slogdet(A2, deg=40, orth=-1, converge="count", count=512, seed=4)
	st2, ldt2 = np.linalg.slogdet(np.asarray(A2))
	assert s2 == st2
	assert abs(ld2 - ldt2) / abs(ldt2) < 0.02


def test_slogdet_spd_skips_count_and_full_result():
	ew = np.random.default_rng(5).uniform(0.5, 2.0, 80)
	A = pt.symmetric(80, pd=True, ew=ew, seed=5)
	(s, ld), result = pt.recipes.slogdet(A, deg=40, orth=-1, converge="count", count=512, seed=6, full=True)
	assert s == 1.0
	assert result.info["n_negative"] == 0
	assert abs(ld - np.sum(np.log(ew))) / abs(np.sum(np.log(ew))) < 0.05


def test_slogdet_spd_tiny_minimum_keeps_positive_sign():
	"""SPD with λ_min tiny vs the range: the inflated interval dips below 0,
	but the unpadded Ritz gate must NOT trigger a (noisy) negative count."""
	ew = np.concatenate([[1e-4, 2e-4], np.random.default_rng(7).uniform(10, 100, 98)])
	A = pt.symmetric(100, pd=True, ew=ew, seed=8)
	(s, ld), res = pt.recipes.slogdet(A, deg=60, orth=-1, converge="count", count=256, seed=9, full=True)
	assert s == 1.0
	assert res.info["n_negative"] == 0


def test_weighted_trace_complex_hermitian():
	"""tr(B·f(A)) for complex Hermitian A, B — the bra side must be conjugated."""
	rng = np.random.default_rng(0)
	n = 40
	H = pt.random.hermitian(n, ew=np.linspace(0.5, 2.0, n), seed=1)
	B = pt.random.hermitian(n, ew=rng.uniform(-1, 1, n), seed=2)
	true = float(np.real(np.trace(np.asarray(B) @ np.asarray(H))))
	est = pt.recipes.weighted_trace(H, jnp.asarray(B), fun=None, converge="count", count=4000, seed=3)
	assert abs(float(est) - true) / abs(true) < 0.2


def test_bilinear_form_complex_entry():
	"""f(A)[i,j] of a Hermitian operator is genuinely complex — 4-term polarization."""
	H = pt.random.hermitian(30, ew=np.linspace(0.1, 3.0, 30), seed=5)
	Hd = np.asarray(H)
	w, V = np.linalg.eigh(Hd)
	F = (V * np.exp(w)) @ V.conj().T
	u = np.zeros(30, complex); u[2] = 1
	v = np.zeros(30, complex); v[7] = 1
	got = pt.recipes.bilinear_form(H, jnp.asarray(u), jnp.asarray(v), fun="exp", deg=30, orth=-1)
	assert abs(got - F[2, 7]) / abs(F[2, 7]) < 1e-6


def test_deflated_trace_complex_hermitian():
	H = pt.random.hermitian(30, ew=np.linspace(0.1, 3.0, 30), seed=5)
	est = pt.recipes.deflated_trace(H, "log", k=4, converge="count", count=512, seed=6)
	true = np.sum(np.log(np.linspace(0.1, 3.0, 30)))
	assert abs(est - true) / abs(true) < 0.15


def test_heat_kernel_signature_full_result():
	A = jnp.asarray(pt.symmetric(20, pd=True, seed=7))
	hks, result = pt.recipes.heat_kernel_signature(A, [0.5, 1.0], converge="count", count=64, seed=8, full=True)
	assert hks.shape == (2, 20)
	assert result.nit > 0


def test_trace_bounds_log_tiny_lambda_min_not_garbage():
	"""Additive interval padding used to push the Radau node ≤ 0 for log —
	collapsing the lower bound to log(eps)-scale. The multiplicative clamp
	keeps the bracket tight (bias-only; MC spread is separate)."""
	ew = np.concatenate([[0.01], np.linspace(1.0, 10.0, 79)])
	A = pt.symmetric(80, pd=True, ew=ew, seed=9)
	true = np.sum(np.log(ew))
	lo, hi = pt.recipes.trace_bounds(A, "log", deg=40, nv=256, seed=10)
	assert hi >= lo and hi - lo < 5 and abs(0.5 * (lo + hi) - true) < 10


def test_trace_bounds_inv_wide_spectrum_not_inverted():
	"""Review r3e: fun='inv' with an auto interval whose additive pad would dip
	below zero — the completely-monotone bracket must stay ordered and finite
	(1/a at a<0 used to invert the upper bound)."""
	rng = np.random.default_rng(0)
	ew = np.concatenate([[1e-3, 2e-3], rng.uniform(0.1, 1.0, 62)])
	A = np.asarray(pt.symmetric(64, pd=True, ew=ew, seed=1), np.float64)
	res = recipes.trace_bounds(A, "inv", deg=16, nv=32, seed=2, full=True)
	assert np.isfinite(res["lower"]) and np.isfinite(res["upper"])
	assert res["lower"] <= res["upper"] + 1e-9
	# the bracket holds the exact probe-sample mean (the quadrature-bias contract)
	lam, U = np.linalg.eigh(A)
	fA = U @ np.diag(1.0 / lam) @ U.T
	from primate_tpu.random import as_key, sample_isotropic

	V = np.asarray(sample_isotropic(as_key(2), (64, 32), pdf="rademacher", dtype=np.float64))
	sm = float(np.einsum("ij,ij->j", V, fA @ V).mean())
	assert res["lower"] - 1e-6 <= sm <= res["upper"] + 1e-6


def test_recipe_closures_have_stable_identity():
	"""Review r3e: parameterized recipe closures are memoized so repeated calls
	reuse the fused program's jit cache instead of recompiling."""
	from primate_tpu.recipes import _memo_fun

	assert _memo_fun("effdim", 0.5) is _memo_fun("effdim", 0.5)
	assert _memo_fun("window", 0.0, 1.0, 0.02) is _memo_fun("window", 0.0, 1.0, 0.02)
	assert _memo_fun("abspow", 2.0) is _memo_fun("abspow", 2.0)
	assert _memo_fun("logabs") is _memo_fun("logabs")
	assert _memo_fun("effdim", 0.5) is not _memo_fun("effdim", 0.6)


def test_tikhonov_solve():
	"""tikhonov: (A + lam I)^-1 b via one fused CG loop (docs/src/table.qmd:19)."""
	rng = np.random.default_rng(2)
	ew = rng.uniform(0.0, 2.0, 48)
	A = np.asarray(pt.symmetric(48, ew=ew, seed=3), np.float64)
	b = rng.normal(size=48)
	x = np.asarray(recipes.tikhonov(A, jnp.asarray(b), lam=0.5, rtol=1e-10))
	want = np.linalg.solve(A + 0.5 * np.eye(48), b)
	assert np.allclose(x, want, atol=1e-7)
	# block RHS
	Bm = rng.normal(size=(48, 3))
	X = np.asarray(recipes.tikhonov(A, jnp.asarray(Bm), lam=0.5, rtol=1e-10))
	assert np.allclose(X, np.linalg.solve(A + 0.5 * np.eye(48), Bm), atol=1e-7)
