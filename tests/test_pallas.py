"""Pallas BSR SpMM kernel vs the jnp reference path (interpret mode on CPU).

Mirrors the SURVEY §4 plan: "Pallas-kernel vs jnp reference-kernel agreement".
"""

import numpy as np
import pytest
import jax.numpy as jnp
import scipy.sparse as sps

from primate_tpu.operators.sparse import BSROperator
from primate_tpu.ops.spmm_pallas import bsr_matmat
from primate_tpu.random import symmetric


def _random_bsr(n: int, bm: int, bn: int, density: float, seed: int) -> BSROperator:
	rng = np.random.default_rng(seed)
	A = sps.random(n, n, density=density, random_state=rng, format="csr")
	A = A + A.T  # symmetric
	return BSROperator.from_scipy(A, blocksize=(bm, bn))


@pytest.mark.parametrize("bm,bn", [(4, 4), (8, 8), (8, 16)])
def test_bsr_pallas_matches_jnp(bm, bn):
	op = _random_bsr(64, bm, bn, density=0.05, seed=0)
	V = jnp.asarray(np.random.default_rng(1).normal(size=(64, 8)))
	got = bsr_matmat(op, V, interpret=True)
	want = op._matmat_jnp(V)
	assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-10)


def test_bsr_pallas_matches_dense():
	n = 32
	A = np.array(symmetric(n, seed=5))
	A[np.abs(A) < 0.02] = 0.0  # sparsify but keep symmetric support
	op = BSROperator.from_scipy(sps.csr_matrix(A), blocksize=(8, 8))
	V = jnp.asarray(np.random.default_rng(2).normal(size=(n, 3)))
	got = bsr_matmat(op, V, interpret=True)
	want = np.asarray(op.todense()) @ np.asarray(V)
	assert np.allclose(np.asarray(got), want, atol=1e-10)


def test_bsr_pallas_empty_block_rows():
	# Rows 8..15 entirely zero: empty block-row must still produce zeros.
	n = 32
	A = np.zeros((n, n))
	A[:8, :8] = np.arange(64).reshape(8, 8)
	A[16:, 16:] = 1.0
	op = BSROperator.from_scipy(sps.csr_matrix(A), blocksize=(8, 8))
	V = jnp.asarray(np.random.default_rng(3).normal(size=(n, 4)))
	got = np.asarray(bsr_matmat(op, V, interpret=True))
	want = A @ np.asarray(V)
	assert np.allclose(got, want, atol=1e-10)
	assert np.allclose(got[8:16], 0.0)


def test_bsr_pallas_single_vector():
	op = _random_bsr(48, 8, 8, density=0.1, seed=7)
	v = jnp.asarray(np.random.default_rng(4).normal(size=48))
	got = bsr_matmat(op, v, interpret=True)
	assert got.shape == (48,)
	want = np.asarray(op.todense()) @ np.asarray(v)
	assert np.allclose(np.asarray(got), want, atol=1e-10)


def test_bsr_pallas_wide_probe_block():
	# k > 128 exercises the lane-padding path on both sides of the boundary.
	op = _random_bsr(64, 8, 8, density=0.08, seed=9)
	V = jnp.asarray(np.random.default_rng(5).normal(size=(64, 130)))
	got = bsr_matmat(op, V, interpret=True)
	want = op._matmat_jnp(V)
	assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-10)
