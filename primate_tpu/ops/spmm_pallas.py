"""Pallas TPU SpMM: block-sparse (BSR) operator times a probe block.

Replaces the reference's Eigen sparse matvec core
(``src/primate/include/eigen_operators.h:58-104``) — the hot kernel under every
Lanczos sweep on sparse operators.

TPU-first design (NOT a CSR scalar-gather translation):
  * TPUs have no efficient scalar gather; the native sparse format is
    **block-sparse**, where every stored nonzero is a dense (bm × bn) tile that
    contracts against the probe block as a small MXU matmul. CSR/COO inputs are
    converted once (``CSROperator.tobsr``) on the host.
  * The kernel iterates a 1-D grid over the ``nnzb`` stored blocks in row-major
    order. Block-row and block-column ids are **scalar-prefetched**
    (`PrefetchScalarGridSpec`), so the pipeline can compute each step's HBM→VMEM
    DMA addresses (which V tile, which output tile) before the step runs —
    Pallas double-buffers the block stream automatically.
  * Consecutive grid steps that land in the same block-row *revisit* the same
    output tile, which therefore stays resident in VMEM; it is zeroed on first
    visit and flushed to HBM exactly once per block-row. Since BSR stores
    blocks row-sorted, every output tile has one contiguous visit range.
  * Accumulation is float32 (MXU-native) regardless of storage dtype; bf16
    blocks upcast only inside the MXU.

Roofline: per grid step the kernel moves bm·bn (block) + bn·k (V tile) words
and does 2·bm·bn·k flops — arithmetic intensity ≈ 2k flops/word for k probe
columns, so Lanczos probe batching directly converts memory-bound SpMV into
MXU-bound SpMM (the BASELINE.json "speed-of-light nnz/s" lever).
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bsr_matmat", "bsr_matmat_pallas", "MAX_PREFETCH_BLOCKS"]

# The row/col id arrays are scalar-prefetched into SMEM (so the pipeline can
# compute DMA addresses ahead of each step); SMEM is tiny, so cap the kernel
# at ~16k stored blocks (2 × 4B × 16k = 128 KB) — larger operators take the
# XLA gather+segment_sum path, which is within ~10% of the kernel anyway.
MAX_PREFETCH_BLOCKS = 16_384


def _round_up(x: int, m: int) -> int:
	return -(-x // m) * m


def _bsr_kernel(rowids_ref, colids_ref, blocks_ref, v_ref, out_ref):
	"""One stored block: out[row] (+)= block @ V[col]. Refs are VMEM tiles."""
	i = pl.program_id(0)
	row = rowids_ref[i]
	prev_row = rowids_ref[jnp.maximum(i - 1, 0)]
	is_first = jnp.logical_or(i == 0, row != prev_row)

	@pl.when(is_first)
	def _():
		out_ref[:] = jnp.zeros_like(out_ref)

	out_ref[:] += jnp.dot(blocks_ref[0], v_ref[:], preferred_element_type=out_ref.dtype)


@partial(jax.jit, static_argnames=("n_out", "interpret"))
def bsr_matmat_pallas(
	blocks: jnp.ndarray,  # (nnzb, bm, bn) stored blocks, row-major by block-row
	rowids: jnp.ndarray,  # (nnzb,) int32 block-row id of each stored block
	colids: jnp.ndarray,  # (nnzb,) int32 block-col id of each stored block
	V: jnp.ndarray,  # (m, k) probe block
	n_out: Optional[int] = None,  # output rows (defaults to square: V.shape[0])
	interpret: bool = False,
) -> jnp.ndarray:
	"""Raw Pallas BSR SpMM on flat arrays → (n_out, k) in f32 accumulation."""
	nnzb, bm, bn = blocks.shape
	m, k = V.shape
	n_out = m if n_out is None else n_out
	# Promote over BOTH operands: deriving from V alone silently accumulated a
	# float64 operator applied to float32 probes at f32 (the XLA fallback path
	# promotes over self.dtype, so use_pallas must not change numerics).
	acc = jnp.promote_types(jnp.promote_types(blocks.dtype, V.dtype), jnp.float32)

	grid_spec = pltpu.PrefetchScalarGridSpec(
		num_scalar_prefetch=2,  # rowids, colids
		grid=(nnzb,),
		in_specs=[
			pl.BlockSpec((1, bm, bn), lambda i, rids, cids: (i, 0, 0)),
			pl.BlockSpec((bn, k), lambda i, rids, cids: (cids[i], 0)),
		],
		out_specs=pl.BlockSpec((bm, k), lambda i, rids, cids: (rids[i], 0)),
	)
	# The number of output block-rows is static: ceil(n_out / bm).
	n_brow = -(-n_out // bm)

	out = pl.pallas_call(
		_bsr_kernel,
		grid_spec=grid_spec,
		out_shape=jax.ShapeDtypeStruct((n_brow * bm, k), acc),
		interpret=interpret,
		cost_estimate=pl.CostEstimate(
			flops=2 * nnzb * bm * bn * k,
			bytes_accessed=(nnzb * bm * bn + nnzb * bn * k + n_brow * bm * k) * 4,
			transcendentals=0,
		),
	)(rowids, colids, blocks, V)
	return out


def bsr_matmat(op, V: jnp.ndarray, interpret: Optional[bool] = None) -> jnp.ndarray:
	"""SpMM ``op @ V`` for a :class:`BSROperator` via the Pallas kernel.

	Pads the probe axis to the 128-lane boundary (TPU tiling), dispatches the
	kernel, and slices back. Rows are assumed covered by the BSR block grid
	(scipy's ``tobsr`` guarantees bm | n). On non-TPU backends the kernel runs
	in interpreter mode only if explicitly requested (tests); production
	dispatch falls back to the XLA gather+segment_sum path in the caller.
	"""
	if interpret is None:
		interpret = jax.default_backend() != "tpu"
	blocks, rowids, colids = op.blocks, op.rowids, op.indices
	if blocks.shape[0] > MAX_PREFETCH_BLOCKS:
		# The row/col ids scalar-prefetch into SMEM; beyond the cap the Mosaic
		# allocation fails opaquely. Raise the documented signal instead — the
		# BSROperator dispatch catches it and takes the XLA path.
		raise NotImplementedError(
			f"BSR Pallas kernel scalar-prefetches block ids into SMEM; {blocks.shape[0]} stored blocks "
			f"exceeds the ~{MAX_PREFETCH_BLOCKS} cap — the XLA gather+segment_sum path handles larger operators."
		)
	n, m = op.shape
	np_r, np_c = op.pshape  # block grid padded to whole tiles
	V = jnp.asarray(V)
	single = V.ndim == 1
	if single:
		V = V[:, None]
	k = V.shape[1]
	k_pad = max(_round_up(k, 128), 128)
	if k_pad != k or V.shape[0] != np_c:
		V = jnp.pad(V, ((0, np_c - V.shape[0]), (0, k_pad - k)))
	out = bsr_matmat_pallas(blocks, rowids, colids, V, n_out=np_r, interpret=bool(interpret))
	out = out[:n, :k].astype(op.dtype)
	return out[:, 0] if single else out
