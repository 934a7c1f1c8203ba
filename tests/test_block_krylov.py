"""Block Lanczos / block quadrature tests (beyond reference — coupled probes).

Strategy mirrors the package norm: prescribed-spectrum fixtures, full-degree
exactness, and the capability single-vector Lanczos provably lacks
(eigenvalue multiplicities)."""

import numpy as np
import jax.numpy as jnp
import primate_tpu as pt
from primate_tpu.block_krylov import block_jacobi_dense, block_lanczos, block_quadrature, block_slq_trace


def _spd(n, seed=0, lo=0.5, hi=2.0):
	rng = np.random.default_rng(seed)
	ew = rng.uniform(lo, hi, n)
	return np.asarray(pt.symmetric(n, pd=True, ew=ew, seed=seed + 1)), ew, rng


def test_block_lanczos_full_degree_recovers_spectrum():
	A, ew, _ = _spd(48)
	out = block_lanczos(A, b=4, deg=12, seed=3)
	T = np.asarray(block_jacobi_dense(out.Ablocks, out.Bblocks))
	assert T.shape == (48, 48)
	assert np.allclose(np.sort(np.linalg.eigvalsh(T)), np.sort(ew), atol=1e-10)
	# T is genuinely block-tridiagonal: zero outside the 2b-1 band
	mask = np.abs(np.subtract.outer(np.arange(48), np.arange(48))) >= 8
	assert np.abs(T[mask]).max() < 1e-12


def test_block_lanczos_basis_orthonormal_and_factorization():
	A, _, _ = _spd(40, seed=5)
	out = block_lanczos(A, b=4, deg=6, seed=7, return_basis=True)
	Q = np.asarray(out.basis).transpose(1, 0, 2).reshape(40, -1)  # (n, deg·b)
	assert np.allclose(Q.T @ Q, np.eye(24), atol=1e-10)
	# three-term relation: A Q = Q T + V_{deg+1} B_deg E_degᵀ
	T = np.asarray(block_jacobi_dense(out.Ablocks, out.Bblocks))
	R = A @ Q - Q @ T
	assert np.abs(R[:, :-4]).max() < 1e-9  # residual lives in the last block only


def test_block_quadrature_identity_exact():
	A, _, rng = _spd(32, seed=9)
	V = rng.normal(size=(32, 4))
	G = np.asarray(block_quadrature(block_lanczos(A, V0=jnp.asarray(V), deg=4), "identity"))
	assert np.allclose(G, V.T @ A @ V, atol=1e-10)


def test_block_quadrature_matches_dense_f():
	A, ew, rng = _spd(36, seed=11)
	lam, U = np.linalg.eigh(A)
	fA = (U * np.log(lam)) @ U.T
	V = rng.normal(size=(36, 3))
	G = np.asarray(block_quadrature(block_lanczos(A, V0=jnp.asarray(V), deg=12), "log"))
	assert np.allclose(G, V.T @ fA @ V, atol=1e-8)


def test_block_lanczos_captures_multiplicity():
	"""A width-b block space holds b copies of a degenerate eigenvalue; a
	single-vector Krylov space holds exactly one (the motivating capability)."""
	rng = np.random.default_rng(13)
	ew = np.concatenate([np.full(3, 1.7), rng.uniform(0.2, 1.0, 45)])
	A = np.asarray(pt.symmetric(48, pd=True, ew=ew, seed=2))
	# block width 3, Krylov dimension 24 (= half of n): all three copies
	out = block_lanczos(A, b=3, deg=8, seed=5)
	ev = np.sort(np.linalg.eigvalsh(np.asarray(block_jacobi_dense(out.Ablocks, out.Bblocks))))
	assert np.sum(np.abs(ev - 1.7) < 1e-6) == 3
	# single-vector full-reorth Lanczos at the SAME Krylov dimension: one copy
	# (exact-arithmetic Krylov spaces hold one eigenvector per eigenvalue;
	# floating-point "ghost" duplicates only appear near full degree)
	a, b_ = pt.lanczos(A, deg=24, orth=24, seed=5)
	ev1 = np.sort(np.asarray(pt.eigvalsh_tridiag(a, b_)))
	assert np.sum(np.abs(ev1 - 1.7) < 1e-3) == 1


def test_block_slq_trace_logdet():
	A, ew, _ = _spd(64, seed=17)
	est, samples = block_slq_trace(A, "log", b=8, deg=8, nblocks=32, seed=19, full=True)
	assert samples.shape == (32,)
	true = np.log(ew).sum()
	assert abs(est - true) <= 10 / np.sqrt(64)
	# seed reproducibility
	assert est == block_slq_trace(A, "log", b=8, deg=8, nblocks=32, seed=19)


def test_block_slq_exact_at_full_space():
	"""deg·b = n: the block rule integrates any f exactly (no quadrature bias),
	so each sample is exactly tr(VᵀfV)/b and the estimator is plain Hutchinson."""
	A, ew, _ = _spd(24, seed=23)
	est, samples = block_slq_trace(A, "exp", b=6, deg=4, nblocks=64, seed=29, full=True)
	assert abs(est - np.exp(ew).sum()) <= 3 * samples.std() / np.sqrt(64) + 1e-8


def test_block_lanczos_operator_input():
	"""Works through the operator protocol (sparse pytree operator input)."""
	import scipy.sparse as sp

	n = 128
	L = (sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n, n)) + sp.eye(n)).tocsr()
	op, _ = pt.operators.auto_operator(L)
	out = block_lanczos(op, b=4, deg=16, seed=31)
	T = np.asarray(block_jacobi_dense(out.Ablocks, out.Bblocks))
	# Ritz values interlace the true spectrum: extremes within the true range
	ev = np.linalg.eigvalsh(T)
	true = np.linalg.eigvalsh(L.toarray())
	assert ev.min() >= true.min() - 1e-8 and ev.max() <= true.max() + 1e-8


def test_block_lanczos_complex_hermitian_full_degree():
	"""Complex-Hermitian operator: real probes, Hermitian block-tridiagonal T,
	full-degree spectrum recovery (package-wide Hermitian convention)."""
	n = 36
	rng = np.random.default_rng(41)
	ew = rng.uniform(0.5, 2.0, n)
	H = np.asarray(pt.hermitian(n, ew=ew, seed=43))
	out = block_lanczos(H, b=4, deg=9, seed=47)
	T = np.asarray(block_jacobi_dense(out.Ablocks, out.Bblocks))
	assert np.allclose(T, T.conj().T, atol=1e-10)  # Hermitian by construction
	assert np.allclose(np.sort(np.linalg.eigvalsh(T)), np.sort(ew), atol=1e-8)


def test_block_quadrature_complex_hermitian_exact():
	"""V† f(H) V matches the dense ground truth on a complex-Hermitian H."""
	n = 32
	rng = np.random.default_rng(53)
	ew = rng.uniform(0.2, 3.0, n)
	H = np.asarray(pt.hermitian(n, ew=ew, seed=59))
	lam, U = np.linalg.eigh(H)
	fH = (U * np.log(lam)) @ U.conj().T
	V = rng.normal(size=(n, 4))  # real probes, complex Krylov space
	G = np.asarray(block_quadrature(block_lanczos(H, V0=jnp.asarray(V), deg=8), "log"))
	assert np.allclose(G, V.T @ fH @ V, atol=1e-8)


def test_block_slq_trace_complex_hermitian():
	n = 48
	rng = np.random.default_rng(61)
	ew = rng.uniform(0.5, 2.0, n)
	H = pt.hermitian(n, ew=ew, seed=67)
	est, samples = block_slq_trace(H, "log", b=8, deg=6, nblocks=32, seed=71, full=True)
	assert np.isrealobj(samples)
	assert abs(est - np.log(ew).sum()) <= 10 / np.sqrt(n)
