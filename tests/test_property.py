"""Property-based invariants (hypothesis) — beyond the reference's test strategy.

The reference pins behavior with seeded statistical tests (SURVEY §4); these
fuzz the STRUCTURAL invariants every estimator relies on, over randomized
sparsity patterns, shapes, and dtypes: format conversions agree with scipy,
every operator's four apply paths (matvec/matmat/matmat_t/rmatvec) are
mutually consistent, the operator algebra matches dense arithmetic, and the
Lanczos sweep's exactness/orthogonality contracts hold at full degree.
Sizes are kept tiny so hundreds of generated cases stay CPU-cheap.
"""

import numpy as np
import pytest
import scipy.sparse as sps
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

import primate_tpu as pt
from primate_tpu.operators import aslinop
from primate_tpu.operators.sparse import BSROperator, COOOperator, CSROperator, DIAOperator

settings.register_profile("ci", max_examples=25, deadline=None, derandomize=True)
settings.load_profile("ci")

pytestmark = pytest.mark.slow  # ~3 min of generated cases; CI's slow job runs it


def _rand_sparse(n: int, density_milli: int, seed: int, banded: bool) -> sps.csr_matrix:
	rng = np.random.default_rng(seed)
	if banded:
		offs = sorted({0, *rng.integers(-min(5, n - 1), min(5, n - 1) + 1, size=3).tolist()})
		mats = [rng.normal(size=n - abs(o)) for o in offs]
		A = sps.diags(mats, offs, shape=(n, n))
	else:
		A = sps.random(n, n, density=max(density_milli, 1) / 1000.0, random_state=int(seed) % 2**31)
	A = (A + A.T).tocsr()
	A.setdiag(A.diagonal() + 1.0)  # ensure a stored diagonal (DIA main band exists)
	return A.tocsr()


@given(
	n=st.integers(6, 40),
	density=st.integers(5, 300),
	seed=st.integers(0, 10_000),
	banded=st.booleans(),
)
def test_formats_agree_with_scipy(n, density, seed, banded):
	"""from_scipy → todense ≡ scipy dense, and all apply paths agree, for every
	sparse format, over random patterns (incl. near-empty and dense-ish)."""
	A = _rand_sparse(n, density, seed, banded)
	Ad = A.toarray()
	rng = np.random.default_rng(seed + 1)
	V = rng.normal(size=(n, 3))
	v = V[:, 0]
	ops = [
		CSROperator.from_scipy(A),
		COOOperator.from_scipy(A.tocoo()),
		DIAOperator.from_scipy(A.todia()),
		BSROperator.from_scipy(A, blocksize=(2, 2)) if n % 2 == 0 else None,
	]
	for op in ops:
		if op is None:
			continue
		name = type(op).__name__
		assert np.allclose(np.asarray(op.todense()), Ad, atol=1e-10), name
		assert np.allclose(np.asarray(op.matvec(jnp.asarray(v))), Ad @ v, atol=1e-8), name
		assert np.allclose(np.asarray(op.matmat(jnp.asarray(V))), Ad @ V, atol=1e-8), name
		assert np.allclose(np.asarray(op.matmat_t(jnp.asarray(V.T))), (Ad @ V).T, atol=1e-8), name
		assert np.allclose(np.asarray(op.rmatvec(jnp.asarray(v))), Ad.T @ v, atol=1e-8), name


@given(
	n=st.integers(4, 24),
	seed=st.integers(0, 10_000),
	c=st.floats(-3, 3, allow_nan=False),
	s=st.floats(-3, 3, allow_nan=False).filter(lambda x: abs(x) > 1e-3),
)
def test_operator_algebra_matches_dense(n, seed, c, s):
	"""(s·A + c·I) ∘ B etc. through the operator algebra ≡ dense arithmetic."""
	rng = np.random.default_rng(seed)
	A = rng.normal(size=(n, n))
	A = (A + A.T) / 2
	B = rng.normal(size=(n, n))
	B = (B + B.T) / 2
	x = rng.normal(size=n)
	opA, opB = aslinop(jnp.asarray(A)), aslinop(jnp.asarray(B))
	assert np.allclose(np.asarray((opA + c) @ x), A @ x + c * x, atol=1e-8)
	assert np.allclose(np.asarray((s * opA) @ x), s * (A @ x), atol=1e-8)
	assert np.allclose(np.asarray((opA - opB) @ x), (A - B) @ x, atol=1e-8)
	assert np.allclose(np.asarray((c - opA) @ x), c * x - A @ x, atol=1e-8)
	assert np.allclose(np.asarray((opA @ opB) @ x), A @ (B @ x), atol=1e-7)
	assert np.allclose(np.asarray((opA / s) @ x), (A @ x) / s, atol=1e-8)
	assert np.allclose(np.asarray(opA.T @ x), A.T @ x, atol=1e-8)


@given(n=st.integers(4, 20), seed=st.integers(0, 10_000))
def test_lanczos_full_degree_exactness(n, seed):
	"""At deg=n with full re-orth: Ritz values ≡ eigenvalues, basis orthonormal."""
	rng = np.random.default_rng(seed)
	ew = np.sort(rng.uniform(0.1, 5.0, n))
	# well-separated spectra only (clustered ones legitimately lose copies)
	if np.min(np.diff(ew)) < 1e-3:
		ew = ew + np.arange(n) * 2e-3
	A = pt.symmetric(n, ew=ew, seed=int(seed) % 2**31)
	(a, b), Q = pt.lanczos(A, deg=n, orth=-1, return_basis=True, seed=int(seed) % 2**31 + 1)
	rw = np.sort(np.asarray(pt.eigvalsh_tridiag(a, b)))
	assert np.allclose(rw, ew, atol=1e-6)
	Qn = np.asarray(Q)[:, :, 0] if np.asarray(Q).ndim == 3 else np.asarray(Q)
	G = Qn.T @ Qn
	assert np.allclose(G, np.eye(G.shape[0]), atol=1e-6)


@given(deg=st.integers(2, 16), seed=st.integers(0, 10_000))
def test_quadrature_rule_properties(deg, seed):
	"""GW rules from random Jacobi matrices: weights ≥ 0 and sum to τ₀ = 1;
	FTTR reproduces them at full degree."""
	rng = np.random.default_rng(seed)
	d = rng.uniform(1.0, 3.0, deg)
	e = rng.uniform(0.2, 0.8, deg - 1)
	nodes, weights = pt.quadrature(jnp.asarray(d), jnp.asarray(e), quad="gw")
	w = np.asarray(weights)
	assert np.all(w >= -1e-12)
	assert abs(w.sum() - 1.0) < 1e-8
	nf, wf = pt.quadrature(jnp.asarray(d), jnp.asarray(e), quad="fttr")
	order = np.argsort(np.asarray(nodes))
	assert np.allclose(np.sort(np.asarray(nf)), np.asarray(nodes)[order], atol=1e-8)
	assert np.allclose(np.asarray(wf)[np.argsort(np.asarray(nf))], w[order], atol=1e-6)


@given(n=st.integers(8, 32), seed=st.integers(0, 10_000))
def test_xtrace_exact_at_full_budget_random(n, seed):
	"""xtrace's m = n exactness is an algebraic identity — must hold for ANY
	symmetric matrix, not just the seeded fixtures."""
	rng = np.random.default_rng(seed)
	A = rng.normal(size=(n, n))
	A = (A + A.T) / 2
	est = pt.xtrace(jnp.asarray(A), batch=max(2, n // 3), seed=int(seed) % 2**31)
	assert abs(float(est) - np.trace(A)) < 1e-4 * max(1.0, abs(np.trace(A)))


@settings(max_examples=15, deadline=None)
@given(n=st.integers(8, 24), seed=st.integers(0, 10_000), fun=st.sampled_from(["log", "inv", "exp"]))
def test_spectral_sum_gradient_identity_random(n, seed, fun):
	"""Property: for any SPD A and builtin f, the spectral_sum cotangent obeys
	d/ds E[tr f((1+s)A)]|₀ = tr(f'(A)·A) — computed exactly from the
	eigendecomposition. Full-probe budget (nv ≥ 8n) keeps estimator noise
	below the tolerance; exercises both the CG (log/inv) and SLQ (exp)
	backward paths over random spectra."""
	import jax

	ew = np.random.default_rng(seed).uniform(0.5, 2.0, n)
	A = jnp.asarray(pt.symmetric(n, pd=True, ew=ew, seed=seed), jnp.float64)

	def f(s):
		return pt.spectral_sum((1.0 + s) * A, fun=fun, deg=n, orth=-1, nv=8 * n, seed=seed + 1, solver_rtol=1e-12)

	g = float(jax.grad(f)(jnp.asarray(0.0, jnp.float64)))
	fp = {"log": lambda x: 1.0 / x, "inv": lambda x: -1.0 / x**2, "exp": np.exp}[fun]
	want = float(np.sum(fp(ew) * ew))  # tr(f'(A)·A) in the eigenbasis
	assert np.isclose(g, want, rtol=0.15), (fun, g, want)


@settings(max_examples=20, deadline=None)
@given(
	n=st.integers(17, 96),
	bw=st.integers(0, 12),
	seed=st.integers(0, 10_000),
	ndev=st.sampled_from([2, 4, 8]),
	comm=st.sampled_from(["auto", "allgather"]),
)
def test_sharded_csr_random_band_matches_scipy(n, bw, seed, ndev, comm):
	"""Property: a random banded matrix (any bandwidth, any uneven row split,
	any device count) partitioned with any comm scheme applies identically to
	scipy — covers halo-width == chip-rows boundaries, empty rows, and
	single-row tails the fixed tests can't enumerate."""
	import jax

	from primate_tpu.parallel import ShardedCSROperator, make_mesh

	rng = np.random.default_rng(seed)
	rows, cols, vals = [], [], []
	for i in range(n):
		lo, hi = max(0, i - bw), min(n, i + bw + 1)
		take = rng.integers(lo, hi, size=min(3, hi - lo), endpoint=False) if hi > lo else []
		for j in np.unique(take):
			rows.append(i)
			cols.append(int(j))
			vals.append(float(rng.normal()))
	A = sps.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
	A = A + sps.eye(n)  # ensure no fully-empty matrix

	import jax as _jax

	mesh = make_mesh((ndev, 1), ("op", "probe"), devices=_jax.devices()[:ndev])
	op = ShardedCSROperator.from_csr(A.tocsr(), mesh, comm=comm)
	V = rng.normal(size=(n, 3))
	got = np.asarray(op.matmat(jnp.asarray(V)))
	want = A @ V
	assert np.allclose(got, want, atol=1e-8), (n, bw, ndev, comm, op.comm, np.abs(got - want).max())
	gotT = np.asarray(op.matmat_t(jnp.asarray(V.T)))
	assert np.allclose(gotT, want.T, atol=1e-8)


@settings(max_examples=12, deadline=None)
@given(
	nb=st.integers(3, 12),
	bs=st.sampled_from([2, 4, 8]),
	seed=st.integers(0, 10_000),
	ndev=st.sampled_from([2, 4, 8]),
)
def test_sharded_bsr_random_tridiag_blocks_match_scipy(nb, bs, seed, ndev):
	"""Property: block-tridiagonal BSR under comm='auto' (halo when legal)
	matches scipy for every (block count, block size, device count) combo —
	including nb < ndev (devices with zero real rows)."""
	from primate_tpu.parallel import make_mesh, shard_operator

	rng = np.random.default_rng(seed)
	n = nb * bs
	diags = [rng.normal(size=n).astype(np.float32)]
	offs = [0]
	if n > bs:
		diags += [rng.normal(size=n - 1).astype(np.float32), rng.normal(size=n - 1).astype(np.float32)]
		offs += [1, -1]
	A = sps.diags(diags, offs).tocsr().astype(np.float32)

	import jax as _jax

	mesh = make_mesh((ndev, 1), ("op", "probe"), devices=_jax.devices()[:ndev])
	op = shard_operator(A, mesh, comm="auto", blocksize=(bs, bs))
	V = rng.normal(size=(n, 2)).astype(np.float32)
	got = np.asarray(op.matmat(jnp.asarray(V)))
	assert np.allclose(got, A @ V, atol=1e-4), (nb, bs, ndev, op.comm)


@given(
	n=st.integers(8, 120),
	seed=st.integers(0, 10_000),
	hubs=st.integers(0, 4),
	k=st.sampled_from([1, 3, 17, 33, 64]),
)
def test_sliced_ell_matches_scipy(n, seed, hubs, k):
	"""The sliced-ELL layout (degree-sorted prefix slots + hub tail + rank
	un-permute, round 5) must be exact for ANY row-length distribution —
	fuzzed over hub counts and probe widths spanning the lane-pad rule's
	boundaries (k=17 pads to 128; k≤16 and k≥64 stay unpadded)."""
	rng = np.random.default_rng(seed)
	A = sps.random(n, n, density=0.05, random_state=int(seed) % 2**31, format="lil")
	for h in range(hubs):
		A[int(rng.integers(0, n)), :] = rng.normal(size=n)
	A = (A + A.T).tocsr()
	A.setdiag(A.diagonal() + 1.0)
	A = A.tocsr()
	op = CSROperator.from_scipy(A)
	V = rng.normal(size=(n, k))
	got = np.asarray(op.matmat(jnp.asarray(V)))
	assert np.allclose(got, A @ V, atol=1e-10), f"layout={'sell' if op.sell is not None else ('ell' if op.ell_data is not None else 'seg')}"
	gotv = np.asarray(op.matvec(jnp.asarray(V[:, 0])))
	assert np.allclose(gotv, A @ V[:, 0], atol=1e-10)
