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


def test_dia_phys_kernel_matches_xla():
	"""Physical-layout stencil kernel: same shape in/out, zero margins, values
	match the XLA shift stencil (interpret mode)."""
	import scipy.sparse as sps

	from primate_tpu.operators.sparse import DIAOperator
	from primate_tpu.ops.dia_pallas import HALO, LANE_TILE, dia_matmat_t_phys

	rng = np.random.default_rng(0)
	n = 3000
	offsets = (-100, -1, 0, 1, 100)
	bands = rng.normal(size=(len(offsets), n)).astype(np.float32)
	N_dom = -(-n // LANE_TILE) * LANE_TILE
	bands_dom = np.zeros((len(offsets), N_dom), np.float32)
	bands_dom[:, :n] = bands
	nv = 8
	X = rng.normal(size=(nv, n)).astype(np.float32)
	Xp = np.zeros((nv, N_dom + 2 * HALO), np.float32)
	Xp[:, HALO : HALO + n] = X
	out = np.asarray(dia_matmat_t_phys(jnp.asarray(bands_dom), jnp.asarray(Xp), offsets, interpret=True))
	op = DIAOperator(jnp.asarray(bands), offsets, (n, n))
	ref = np.asarray(op.matmat_t(jnp.asarray(X)))
	assert np.abs(out[:, :HALO]).max() == 0 and np.abs(out[:, HALO + n :]).max() == 0
	assert np.allclose(out[:, HALO : HALO + n], ref, atol=1e-4)


def test_lanczos_phys_carry_matches_flat():
	"""The halo-padded probe-major Lanczos carry (phys=True, interpret kernel)
	reproduces the flat sweep's Jacobi matrices, basis, and two-pass y."""
	import scipy.sparse as sps

	from primate_tpu.lanczos import lanczos_block_op
	from primate_tpu.operators.sparse import DIAOperator

	n = 3000
	L = sps.diags([-np.ones(n - 1), 3.0 * np.ones(n), -np.ones(n - 1)], [-1, 0, 1]).tocsr()
	op = DIAOperator.from_scipy(L, dtype=jnp.float32)
	rng = np.random.default_rng(0)
	V0 = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
	o_flat = lanczos_block_op(op, V0, deg=20, ncv=20, orth=5, phys=False)
	o_phys = lanczos_block_op(op, V0, deg=20, ncv=20, orth=5, phys=True)
	assert np.allclose(np.asarray(o_flat.alphas), np.asarray(o_phys.alphas), atol=1e-4)
	assert np.allclose(np.asarray(o_flat.betas), np.asarray(o_phys.betas), atol=1e-4)
	assert np.allclose(np.asarray(o_flat.Q), np.asarray(o_phys.Q), atol=1e-4)
	c = jnp.asarray(rng.normal(size=(20, 16)).astype(np.float32))
	y_flat = lanczos_block_op(op, V0, deg=20, ncv=5, orth=3, return_basis=False, coeffs=c, phys=False)
	y_phys = lanczos_block_op(op, V0, deg=20, ncv=5, orth=3, return_basis=False, coeffs=c, phys=True)
	assert np.allclose(np.asarray(y_flat.y), np.asarray(y_phys.y), atol=1e-3)


def test_lanczos_phys_opt_in_via_use_pallas():
	"""phys=None engages the padded carry only when the operator explicitly
	sets use_pallas=True (the fused XLA path is the measured default)."""
	import scipy.sparse as sps

	from primate_tpu.operators.sparse import DIAOperator

	n = 512
	L = sps.diags([-np.ones(n - 1), 3.0 * np.ones(n), -np.ones(n - 1)], [-1, 0, 1]).tocsr()
	op = DIAOperator.from_scipy(L, dtype=jnp.float32)
	assert op.phys_spec(16, interpret=True) is not None  # eligible when asked
	# default (use_pallas=None) + phys=None → flat path even on TPU backends;
	# covered structurally: the sweep only calls phys_spec when engaged.
	from primate_tpu.lanczos import lanczos_block_op

	out = lanczos_block_op(op, jnp.asarray(np.random.default_rng(1).normal(size=(n, 8)).astype(np.float32)), deg=8, ncv=8, orth=2)
	assert out.alphas.shape == (8, 8)


def test_lanczos_phys_true_warns_when_ineligible():
	"""Review r3: explicit phys=True on an ineligible sweep (nv % 8 != 0) warns
	instead of silently running the flat path."""
	import warnings

	import scipy.sparse as sps

	from primate_tpu.lanczos import lanczos_block_op
	from primate_tpu.operators.sparse import DIAOperator

	n = 256
	L = sps.diags([-np.ones(n - 1), 3.0 * np.ones(n), -np.ones(n - 1)], [-1, 0, 1]).tocsr()
	op = DIAOperator.from_scipy(L, dtype=jnp.float32)
	V0 = jnp.asarray(np.random.default_rng(0).normal(size=(n, 5)).astype(np.float32))  # 5 % 8 != 0
	with warnings.catch_warnings(record=True) as w:
		warnings.simplefilter("always")
		out = lanczos_block_op(op, V0, deg=8, ncv=8, orth=2, phys=True)
	assert out.alphas.shape == (8, 5)
	assert any("phys=True" in str(x.message) for x in w)
