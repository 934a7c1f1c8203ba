"""Quadrature tests (mirrors reference `tests/test_quadrature.py`)."""

import numpy as np
import jax
import jax.numpy as jnp
import primate_tpu as pt
from primate_tpu.lanczos import lanczos_block


def test_gw_quadrature_trace_estimate():
	"""Mean of per-probe GW quadrature estimates × n approximates tr(A)."""
	rng = np.random.default_rng(1234)
	n = 30
	ew = rng.uniform(size=n, low=0.1, high=1.0)
	A = pt.symmetric(n, pd=True, ew=ew, seed=rng)
	nv = 100
	V0 = rng.choice([-1.0, 1.0], size=(n, nv))
	out = lanczos_block(lambda V: A @ V, jax.numpy.asarray(V0), deg=n, ncv=n, orth=n, rtol=0.0)
	nodes, weights = pt.quadrature(out.alphas.T, out.betas[: n - 1].T, quad="gw")
	ests = n * np.sum(np.asarray(nodes) * np.asarray(weights), axis=-1)
	tr = float(ew.sum())
	assert np.abs(ests.mean() - tr) / tr < 0.10


def test_fttr_matches_gw_weights():
	rng = np.random.default_rng(9)
	n = 16
	A = pt.symmetric(n, pd=True, seed=rng)
	a, b = pt.lanczos(A, deg=n, orth=n, seed=rng)
	ngw, wgw = pt.quadrature(a, b, quad="gw")
	nft, wft = pt.quadrature(a, b, quad="fttr")
	i, j = np.argsort(np.asarray(ngw)), np.argsort(np.asarray(nft))
	assert np.allclose(np.asarray(ngw)[i], np.asarray(nft)[j], atol=1e-10)
	assert np.allclose(np.asarray(wgw)[i], np.asarray(wft)[j], atol=1e-8)


def test_quadrature_weights_sum_to_one():
	"""For a unit start vector, GW weights are |⟨q₀, uᵢ⟩|² and sum to 1."""
	rng = np.random.default_rng(3)
	n = 20
	A = pt.symmetric(n, pd=True, seed=rng)
	a, b = pt.lanczos(A, deg=n, orth=n, seed=rng)
	_, tau = pt.quadrature(a, b, quad="gw")
	assert np.isclose(np.asarray(tau).sum(), 1.0, atol=1e-10)


def test_lanczos_quadrature_alias():
	"""`lanczos_quadrature` is the reference docs' name for `quadrature`
	(docs/src/reference/lanczos_quadrature.qmd) — a drop-in alias."""
	assert pt.lanczos_quadrature is pt.quadrature


def test_quadrature_batched():
	rng = np.random.default_rng(17)
	n, nv = 12, 3
	A = pt.symmetric(n, pd=True, seed=rng)
	V0 = rng.normal(size=(n, nv))
	a, b = pt.lanczos(A, v0=V0, deg=n, orth=n)
	nodes, weights = pt.quadrature(np.asarray(a).T, np.asarray(b).T, quad="gw")
	assert nodes.shape == (nv, n) and weights.shape == (nv, n)
	for j in range(nv):
		n_j, w_j = pt.quadrature(np.asarray(a)[:, j], np.asarray(b)[:, j], quad="gw")
		assert np.allclose(np.asarray(nodes)[j], np.asarray(n_j))
		assert np.allclose(np.asarray(weights)[j], np.asarray(w_j))


def test_quadrature_exact_for_polynomials():
	"""A degree-d rule integrates f(x)=x^k exactly for k ≤ 2d-1:
	quadrature of x ↦ x² against ψ(x; A, v) equals vᵀA²v / ‖v‖²."""
	rng = np.random.default_rng(21)
	n = 16
	A = np.asarray(pt.symmetric(n, pd=True, seed=rng))
	v = rng.normal(size=n)
	a, b = pt.lanczos(pt.operators.DenseOperator(A), v0=v, deg=6, orth=6)
	nodes, weights = pt.quadrature(a, b, quad="gw")
	est = np.sum(np.asarray(nodes) ** 2 * np.asarray(weights)) * (v @ v)
	true = v @ A @ A @ v
	assert np.isclose(est, true, rtol=1e-10)


def test_ortho_poly_matches_numpy_recurrence():
	"""`ortho_poly` ≡ a direct numpy transliteration of the three-term
	recurrence (reference fttr.py:5-11 semantics), over a batch of points."""
	from primate_tpu.fttr import ortho_poly

	rng = np.random.default_rng(5)
	n = 12
	A = pt.symmetric(n, pd=True, seed=rng)
	a, b_off = pt.lanczos(A, deg=n, orth=n, seed=rng)
	a = np.asarray(a, float)
	b = np.concatenate([[0.0], np.asarray(b_off, float)])  # leading-slot convention
	xs = rng.uniform(0.0, 1.5, size=7)
	mu_sqrt_rec = 1.0 / np.sqrt(3.0)

	P = np.asarray(ortho_poly(xs, mu_sqrt_rec, a, b))
	assert P.shape == (7, n)
	for k, x in enumerate(xs):
		z = np.zeros(n)
		z[0] = mu_sqrt_rec
		z[1] = (x - a[0]) * z[0] / b[1]
		for i in range(2, n):
			z[i] = (x - a[i - 1]) / b[i] * z[i - 1] - b[i - 1] / b[i] * z[i - 2]
		assert np.allclose(P[k], z, atol=1e-10)


def test_ortho_poly_orthonormal_under_gauss_rule():
	"""With mu_sqrt_rec=1, the sequence is orthonormal w.r.t. the spectral
	measure: Σ_j τ_j p_d(θ_j) p_e(θ_j) = δ_de (exact — deg(p_d p_e) ≤ 2n-2)."""
	from primate_tpu.fttr import ortho_poly

	rng = np.random.default_rng(8)
	n = 10
	A = pt.symmetric(n, pd=True, seed=rng)
	a, b_off = pt.lanczos(A, deg=n, orth=n, seed=rng)
	nodes, weights = pt.quadrature(a, b_off, quad="gw")
	b = np.concatenate([[0.0], np.asarray(b_off, float)])
	P = np.asarray(ortho_poly(np.asarray(nodes), 1.0, np.asarray(a, float), b))  # (n, n)
	G = np.einsum("j,jd,je->de", np.asarray(weights), P, P)
	assert np.allclose(G, np.eye(n), atol=1e-6)


def test_ortho_poly_out_params():
	"""Pythran drop-in: ``ortho_poly(x, mu_sqrt_rec, a, b, z, n)`` fills a
	preallocated numpy ``z`` in place and returns None (`fttr.py:5-11`)."""
	from primate_tpu.fttr import ortho_poly

	a = np.full(6, 0.1)
	b = np.concatenate([[0.0], np.full(5, 0.4)])
	z = np.zeros(6)
	assert ortho_poly(0.3, 1.0, a, b, z, 6) is None
	assert np.allclose(z, np.asarray(ortho_poly(0.3, 1.0, a, b)))


def test_radau_rule_places_node_and_brackets():
	"""Radau nodes land exactly at the prescribed endpoint; for log (bernstein
	class) the radau-at-λmin rule bounds each probe's quadratic form from below
	and plain Gauss from above (Golub-Meurant ch. 6-7)."""
	from primate_tpu.integrate import radau_rule
	from primate_tpu.lanczos import lanczos_block
	import jax.numpy as jnp

	rng = np.random.default_rng(42)
	n, deg, nv = 48, 10, 12
	ew = rng.uniform(0.5, 4.0, n)
	A = np.asarray(pt.symmetric(n, pd=True, ew=ew, seed=1), np.float64)
	a0, b0 = 0.95 * ew.min(), 1.05 * ew.max()
	V = rng.normal(size=(n, nv))
	out = lanczos_block(lambda X: jnp.asarray(A) @ X, jnp.asarray(V), deg=deg, ncv=deg, orth=deg)
	d, e, be = out.alphas.T, out.betas[: deg - 1].T, out.betas[deg - 1]

	nodes, weights = radau_rule(d, e, be, a0)
	assert nodes.shape == (nv, deg + 1) and weights.shape == (nv, deg + 1)
	assert float(np.abs(np.asarray(nodes) - a0).min(axis=1).max()) < 1e-10
	assert np.allclose(np.asarray(weights).sum(axis=1), 1.0, atol=1e-10)

	lam, U = np.linalg.eigh(A)
	truth = np.einsum("ij,ij->j", V, (U @ np.diag(np.log(lam)) @ U.T) @ V)
	norm2 = (V**2).sum(axis=0)
	lo_est = np.asarray(jnp.sum(jnp.log(nodes) * weights, axis=1)) * norm2
	g_nodes, g_weights = pt.quadrature(d, e, deg=deg)
	hi_est = np.asarray(jnp.sum(jnp.log(g_nodes) * g_weights, axis=1)) * norm2
	assert np.all(lo_est <= truth + 1e-8)
	assert np.all(hi_est >= truth - 1e-8)


def test_lobatto_rule_places_both_nodes():
	"""Lobatto fixes nodes at BOTH endpoints; weights stay a probability rule."""
	from primate_tpu.integrate import lobatto_rule
	from primate_tpu.lanczos import lanczos_block
	import jax.numpy as jnp

	rng = np.random.default_rng(7)
	n, deg = 40, 8
	ew = rng.uniform(1.0, 3.0, n)
	A = np.asarray(pt.symmetric(n, pd=True, ew=ew, seed=2), np.float64)
	a0, b0 = 0.9 * ew.min(), 1.1 * ew.max()
	V = rng.normal(size=(n, 6))
	out = lanczos_block(lambda X: jnp.asarray(A) @ X, jnp.asarray(V), deg=deg, ncv=deg, orth=deg)
	nodes, weights = lobatto_rule(out.alphas.T, out.betas[: deg - 1].T, out.betas[deg - 1], a0, b0)
	assert float(np.abs(np.asarray(nodes) - a0).min(axis=1).max()) < 1e-9
	assert float(np.abs(np.asarray(nodes) - b0).min(axis=1).max()) < 1e-9
	assert np.allclose(np.asarray(weights).sum(axis=1), 1.0, atol=1e-10)
	assert np.all(np.asarray(weights) >= -1e-12)


def test_fttr_truncates_jacobi_to_k():
	"""fttr(theta, a, b, k) with k < len(a): weights must come from the LEADING
	k×k Jacobi matrix (the reference's ortho_poly runs k polynomial terms)."""
	rng = np.random.default_rng(0)
	ew = np.sort(rng.uniform(0.2, 2.0, 64))
	A = np.asarray(pt.symmetric(64, ew=ew, seed=3))
	a, b = pt.lanczos(A, deg=8, orth=-1, seed=4)
	a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
	b_pad = np.concatenate([[0.0], b])
	T4 = np.diag(a[:4]) + np.diag(b_pad[1:4], 1) + np.diag(b_pad[1:4], -1)
	th4, Y4 = np.linalg.eigh(T4)
	w = np.asarray(pt.fttr.fttr(jnp.asarray(th4), jnp.asarray(a), jnp.asarray(b_pad), 4))
	assert np.allclose(np.sort(w[:4]), np.sort(Y4[0] ** 2), atol=1e-8)
	assert abs(w[:4].sum() - 1.0) < 1e-10


def test_radau_rule_deflated_probe_no_nan():
	"""Review r3c: zero-padded (deflated) Jacobi coefficients with x0 on an
	eigenvalue of the padded matrix must not NaN the modified rule."""
	d = jnp.asarray([2.0, 1.0, 0.0, 0.0])
	e = jnp.asarray([0.5, 0.0, 0.0])
	for be in (0.0, 0.3):
		nodes, weights = pt.integrate.radau_rule(d, e, jnp.asarray(be), 0.0)
		assert np.all(np.isfinite(np.asarray(nodes))), be
		s = float(jnp.sum(jnp.exp(nodes) * weights))
		assert np.isfinite(s), be


def test_quadrature_partial_output_fill():
	"""Review r3c: preallocated nodes/weights larger than deg fill only the
	leading entries (reference out-array semantics) instead of crashing."""
	rng = np.random.default_rng(0)
	d = jnp.asarray(rng.uniform(1, 3, 10))
	e = jnp.asarray(rng.uniform(0.2, 0.8, 9))
	nodes = np.full(20, -1.0)
	weights = np.full(20, -1.0)
	nd, wt = pt.quadrature(d, e, deg=10, nodes=nodes, weights=weights)
	assert np.all(np.asarray(nd)[10:] == -1.0) and np.all(np.asarray(wt)[10:] == -1.0)
	assert np.all(np.asarray(wt)[:10] >= 0)
