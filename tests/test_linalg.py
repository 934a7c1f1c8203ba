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
