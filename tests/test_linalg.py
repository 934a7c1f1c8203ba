"""Incremental linear-algebra update tests (mirrors reference `tests/test_linalg.py`)."""

import numpy as np
import jax.numpy as jnp
from primate_tpu.linalg import qr_append, update_trinv, update_trinv_block


def test_update_trinv_matches_dense_inverse():
	rng = np.random.default_rng(1234)
	R = np.zeros((0, 0))
	R_inv = np.zeros((0, 0))
	for n in range(1, 20):
		col = rng.uniform(size=n, low=0.5, high=2.0)
		R_new = np.zeros((n, n))
		R_new[: n - 1, : n - 1] = R
		R_new[:, -1] = col
		R_inv = np.asarray(update_trinv(jnp.asarray(R_inv), jnp.asarray(col)))
		assert np.allclose(R_inv, np.linalg.inv(R_new), atol=1e-8)
		R = R_new


def test_update_trinv_block_matches_dense_inverse():
	rng = np.random.default_rng(5)
	m, b = 6, 4
	R = np.triu(rng.uniform(size=(m, m), low=0.5, high=2.0))
	B = rng.normal(size=(m, b))
	C = np.triu(rng.uniform(size=(b, b), low=0.5, high=2.0))
	full = np.block([[R, B], [np.zeros((b, m)), C]])
	out = np.asarray(update_trinv_block(jnp.asarray(np.linalg.inv(R)), jnp.asarray(B), jnp.asarray(C)))
	assert np.allclose(out, np.linalg.inv(full), atol=1e-10)


def test_update_trinv_block_from_empty():
	rng = np.random.default_rng(6)
	C = np.triu(rng.uniform(size=(3, 3), low=0.5, high=2.0))
	out = np.asarray(update_trinv_block(jnp.zeros((0, 0)), jnp.zeros((0, 3)), jnp.asarray(C)))
	assert np.allclose(out, np.linalg.inv(C), atol=1e-12)


def test_qr_append_matches_full_qr():
	rng = np.random.default_rng(7)
	n = 30
	Y1, Y2 = rng.normal(size=(n, 5)), rng.normal(size=(n, 4))
	Q, R = qr_append(None, None, jnp.asarray(Y1))
	Q, R = qr_append(Q, R, jnp.asarray(Y2))
	Q, R = np.asarray(Q), np.asarray(R)
	Y = np.concatenate([Y1, Y2], axis=1)
	assert np.allclose(Q.T @ Q, np.eye(9), atol=1e-10)  # orthonormal
	assert np.allclose(Q @ R, Y, atol=1e-10)  # factorization holds
	assert np.allclose(np.tril(R, -1), 0.0, atol=1e-10)  # R upper-triangular


def test_tall_qr_rank_deficient_falls_back():
	"""Shifted CholeskyQR3 NaNs on rank-deficient blocks; tall_qr must detect
	that at runtime and fall back to Householder QR (round-5 review finding:
	hutchpp/diagpp/xdiag returned NaN on exactly low-rank operators)."""
	import jax
	import jax.numpy as jnp
	import numpy as np

	from primate_tpu.linalg import tall_qr

	rng = np.random.default_rng(0)
	B = jnp.asarray(rng.normal(size=(1024, 8)), jnp.float32)
	Y = B @ jnp.asarray(rng.normal(size=(8, 96)), jnp.float32)  # rank 8 < 96
	Q, R = jax.jit(tall_qr)(Y)
	assert bool(jnp.isfinite(Q).all()) and bool(jnp.isfinite(R).all())
	assert float(jnp.abs(Q @ R - Y).max()) < 1e-3
	# full-rank path still takes the fast branch and stays orthonormal
	Yf = jnp.asarray(rng.normal(size=(1024, 64)), jnp.float32)
	Qf, Rf = tall_qr(Yf)
	assert float(jnp.abs(Qf.T @ Qf - jnp.eye(64)).max()) < 1e-4


def test_low_rank_sketch_estimators_finite():
	"""End-to-end guard for the same finding: sketches of low-rank operators."""
	import numpy as np

	import primate_tpu as pt

	rng = np.random.default_rng(1)
	B = rng.normal(size=(512, 8)).astype(np.float32)
	A = (B @ B.T).astype(np.float32)
	est = pt.hutchpp(A, m=96, seed=1)
	assert np.isfinite(est) and abs(est - np.trace(A)) / np.trace(A) < 1e-3  # exact: rank <= sketch
	assert np.isfinite(pt.diagpp(A, m=32, seed=1)).all()
	assert np.isfinite(pt.xdiag(A, m=64, seed=1)).all()


def test_tall_qr_complex():
	"""Complex-Hermitian operands route through the conjugate-aware CholeskyQR3."""
	import jax
	import jax.numpy as jnp
	import numpy as np

	from primate_tpu.linalg import tall_qr

	rng = np.random.default_rng(2)
	Y = jnp.asarray(rng.normal(size=(1024, 24)) + 1j * rng.normal(size=(1024, 24)), jnp.complex64)
	Q, R = tall_qr(Y)
	assert float(jnp.abs(jnp.conj(Q).T @ Q - jnp.eye(24)).max()) < 1e-4
	assert float(jnp.abs(Q @ R - Y).max()) < 1e-4
