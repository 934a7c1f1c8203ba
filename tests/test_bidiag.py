"""Golub-Kahan-Lanczos bidiagonalization: factorization, quadrature, dispatch.

GKL builds the Gram spectrum's Krylov information from un-squared applies
(one A + one Aᵀ per step); `MatrixFunction(GramOperator(X)).quad` dispatches
to it transparently, so Schatten/nuclear estimates condition at κ(A) rather
than κ(A)². (Beyond-reference: the reference's gram mode runs symmetric
Lanczos on AᵀA matvecs, `eigen_operators.h:58,69-75`.)
"""

import numpy as np
import pytest
import jax.numpy as jnp

import primate_tpu as pt
from primate_tpu.bidiag import bidiag_jacobi
from primate_tpu.integrate import spectral_quad_form
from primate_tpu.operators.sparse import GramOperator


@pytest.fixture(scope="module")
def rect():
	rng = np.random.default_rng(0)
	A = rng.standard_normal((60, 40))
	return A, np.linalg.svd(A, compute_uv=False)


def _bidiag_matrix(alphas, betas, j):
	return np.diag(np.asarray(alphas)[:, j]) + np.diag(np.asarray(betas)[:, j], 1)


def test_full_degree_recovers_singular_values(rect):
	A, s_true = rect
	n = A.shape[1]
	V0 = np.random.default_rng(1).standard_normal((n, 3))
	out = pt.lanczos_bidiag(A, V0, deg=n, orth=-1, dtype=np.float64)
	for j in range(3):
		sB = np.linalg.svd(_bidiag_matrix(out.alphas, out.betas, j), compute_uv=False)
		assert np.allclose(np.sort(sB), np.sort(s_true), atol=1e-8)


def test_bases_orthonormal_and_factorization(rect):
	A, _ = rect
	n = A.shape[1]
	v0 = np.random.default_rng(2).standard_normal(n)
	deg = 15
	out = pt.lanczos_bidiag(A, v0, deg=deg, orth=-1, return_basis=True, dtype=np.float64)
	U = np.asarray(out.U)[:, :, 0]
	V = np.asarray(out.V)[:, :, 0]
	assert np.allclose(U @ U.T, np.eye(deg), atol=1e-10)
	assert np.allclose(V @ V.T, np.eye(deg), atol=1e-10)
	B = _bidiag_matrix(out.alphas, out.betas, 0)
	assert np.allclose(A @ V.T, U.T @ B, atol=1e-8)  # A V_deg = U_deg B


def test_gkl_quadrature_identity(rect):
	A, _ = rect
	n = A.shape[1]
	G = A.T @ A
	w, U = np.linalg.eigh(G)
	v = np.random.default_rng(3).standard_normal(n)
	gt = v @ (U @ (np.log(w) * (U.T @ v)))
	out = pt.lanczos_bidiag(A, v, deg=n, orth=-1, dtype=np.float64)
	d, e = bidiag_jacobi(out.alphas, out.betas)
	val = np.asarray(spectral_quad_form(d.T, e.T, lambda x: jnp.log(x)))[0] * (v @ v)
	assert np.isclose(val, gt, rtol=1e-8)


def test_early_exit_on_rank_deficiency():
	rng = np.random.default_rng(4)
	A = rng.standard_normal((30, 5)) @ rng.standard_normal((5, 20))  # rank 5
	out = pt.lanczos_bidiag(A, rng.standard_normal(20), deg=12, orth=-1, dtype=np.float64)
	al, be = np.asarray(out.alphas)[:, 0], np.asarray(out.betas)[:, 0]
	# Grade = rank + 1 here: v₁ carries a null-space component, so the Krylov
	# space is the 5-dim row space plus that one direction — α₆ ≈ 0 terminates
	# the recurrence and everything after decouples to exact zeros.
	assert abs(al[5]) < 1e-8
	assert np.all(al[6:] == 0) and np.all(be[5:] == 0)
	sB = np.linalg.svd(np.diag(al[:6]) + np.diag(be[:5], 1), compute_uv=False)
	s_true = np.linalg.svd(A, compute_uv=False)[:5]
	assert np.allclose(np.sort(sB)[1:], np.sort(s_true), atol=1e-8)  # + one zero
	assert np.sort(sB)[0] < 1e-8


@pytest.mark.parametrize("transpose_first", [True, False])
def test_matrix_function_gram_dispatch(rect, transpose_first):
	A, s_true = rect
	G = (A.T @ A) if transpose_first else (A @ A.T)
	w, U = np.linalg.eigh(G)
	k = G.shape[0]
	M = pt.MatrixFunction(
		GramOperator(jnp.asarray(A), transpose_first=transpose_first),
		fun="sqrt", deg=40, orth=-1, dtype=np.float64,
	)
	X = np.random.default_rng(5).standard_normal((k, 6))
	q = np.asarray(M.quad(jnp.asarray(X)))
	gt = np.einsum("ij,ij->j", X, U @ (np.sqrt(np.maximum(w, 0.0))[:, None] * (U.T @ X)))
	assert np.allclose(q, gt, rtol=1e-6)


def test_hutch_gram_nuclear_norm(rect):
	A, s_true = rect
	M = pt.MatrixFunction(GramOperator(jnp.asarray(A)), fun="sqrt", deg=30, orth=-1, dtype=np.float64)
	est = pt.hutch(M, batch=16, converge="count", count=600, seed=3)
	assert np.isclose(est, s_true.sum(), rtol=0.1)


def test_gkl_stacked_schatten(rect):
	"""Stacked p-families compose with the GKL Gram path unchanged."""
	A, s_true = rect
	ps = np.array([1.0, 2.0])
	est = pt.recipes.schatten(A, p=ps, gram=True, deg=30, orth=-1, converge="count", count=600, seed=3)
	gt = np.array([np.sum(s_true**p) ** (1.0 / p) for p in ps])
	assert np.allclose(est, gt, rtol=0.1)


def test_gkl_conditioning_beats_gram_lanczos_f32():
	"""The stability claim, measured: an ill-conditioned A (κ ≈ 3e3, so
	κ(AᵀA) ≈ 1e7 ≈ 1/eps_f32) — GKL quadrature of tr(log AᵀA) in float32
	stays accurate where symmetric Lanczos on the squared operator loses
	the small-singular-value mass."""
	rng = np.random.default_rng(6)
	n = 48
	U, _ = np.linalg.qr(rng.standard_normal((n, n)))
	V, _ = np.linalg.qr(rng.standard_normal((n, n)))
	s = np.geomspace(1.0, 3e-4, n)
	A = (U * s) @ V.T
	gt = 2 * np.sum(np.log(s))
	X = rng.standard_normal((n, 16)).astype(np.float32)

	gram = GramOperator(jnp.asarray(A, jnp.float32))
	M_gkl = pt.MatrixFunction(gram, fun="log", deg=n, orth=-1, dtype=np.float32)
	q_gkl = float(np.mean(np.asarray(M_gkl.quad(jnp.asarray(X)))) * n / np.mean(np.sum(X**2, axis=0)))

	# the pre-dispatch path: symmetric Lanczos on the Gram matvec
	from primate_tpu.lanczos import lanczos_block_op
	from primate_tpu.operators import aslinop

	out = lanczos_block_op(aslinop(gram), jnp.asarray(X), deg=n, ncv=n, orth=n)
	vals = np.asarray(
		spectral_quad_form(out.alphas.T, out.betas[: n - 1].T, lambda x: jnp.log(jnp.maximum(x, 1e-30)))
	)
	q_sq = float(np.mean(vals) * n / np.mean(np.sum(X**2, axis=0)))

	err_gkl = abs(q_gkl - gt) / abs(gt)
	err_sq = abs(q_sq - gt) / abs(gt)
	assert err_gkl < 0.05
	assert err_gkl < err_sq  # squaring loses accuracy first


def test_factorization_survives_alpha_breakdown():
	"""A V = U B must hold on rank-deficient operators: the α-breakdown step's
	v_next is still referenced by B's last column and must be stored."""
	rng = np.random.default_rng(4)
	A = rng.standard_normal((30, 5)) @ rng.standard_normal((5, 20))  # rank 5
	out = pt.lanczos_bidiag(A, rng.standard_normal(20), deg=12, orth=-1, return_basis=True, dtype=np.float64)
	al, be = np.asarray(out.alphas)[:, 0], np.asarray(out.betas)[:, 0]
	B = np.diag(al) + np.diag(be, 1)
	U = np.asarray(out.U)[:, :, 0]
	V = np.asarray(out.V)[:, :, 0]
	assert np.max(np.abs(A @ V.T - U.T @ B)) < 1e-8


def test_bidiag_residual_matches_dense_recurrence():
	"""return_residual: β_deg from one extra adjoint apply equals the dense GKL."""
	import jax.numpy as jnp
	from primate_tpu.bidiag import lanczos_bidiag_op
	from primate_tpu.operators import aslinop

	rng = np.random.default_rng(0)
	m, n, deg = 40, 25, 7
	X = rng.normal(size=(m, n)) + 3 * np.eye(m, n)
	V = rng.normal(size=(n, 4))
	out = lanczos_bidiag_op(aslinop(jnp.asarray(X)), jnp.asarray(V), deg=deg, orth=deg, return_residual=True)
	for j in range(4):
		v = V[:, j] / np.linalg.norm(V[:, j])
		Vb, Ub, al, be = [v], [], [], []
		p = X @ v
		a = np.linalg.norm(p)
		u = p / a
		Ub.append(u)
		al.append(a)
		for _ in range(deg - 1):
			r = X.T @ u - a * v
			for vv in Vb:
				r -= (r @ vv) * vv
			b = np.linalg.norm(r)
			v = r / b
			Vb.append(v)
			be.append(b)
			p = X @ v - b * u
			for uu in Ub:
				p -= (p @ uu) * uu
			a = np.linalg.norm(p)
			u = p / a
			Ub.append(u)
			al.append(a)
		r = X.T @ u - a * v
		for vv in Vb:
			r -= (r @ vv) * vv
		assert abs(float(out.residual[j]) - np.linalg.norm(r)) < 1e-8


def test_lanczos_bidiag_public_residual_and_adjoint():
	"""Review r3d: the public driver forwards return_residual/adjoint."""
	rng = np.random.default_rng(0)
	X = jnp.asarray(rng.normal(size=(30, 20)))
	out = pt.bidiag.lanczos_bidiag(X, deg=8, orth=-1, seed=1, return_residual=True)
	assert out.residual is not None and np.all(np.isfinite(np.asarray(out.residual)))
	out2 = pt.bidiag.lanczos_bidiag(X, deg=8, orth=-1, seed=1, adjoint=True)
	assert out2.alphas.shape[0] == 8
