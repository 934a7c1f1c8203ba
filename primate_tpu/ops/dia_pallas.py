"""Pallas TPU stencil SpMM for banded (DIA) operators.

The speed-of-light path for mesh/graph-Laplacian matvecs (BASELINE configs
2/4): all nonzero diagonals are fused into ONE pass over the probe block.
``V`` stays resident in HBM (a single copy — no per-neighbor duplicates, so
10M-row operators fit); each grid step DMAs its row tile *plus the halo rows*
``[i·TILE − moff, (i+1)·TILE + moff)`` into a VMEM scratch and performs the
whole shift-multiply-add stencil on the VPU. Bands and the output tile ride
the normal Pallas pipeline (double-buffered automatically).

Constraint: max |offset| ≤ TILE (one tile of halo each side). Wider bands
fall back to the XLA path. Boundary reads land in the explicit zero padding
added by the wrapper, and row-aligned band storage zeroes every out-of-range
entry, so no masking is needed in-kernel.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dia_matmat", "dia_matmat_pallas"]

TILE = 2048  # rows per grid step (f32 sublane-aligned; moff must fit in one tile)


def _round_up(x: int, m: int) -> int:
	return -(-x // m) * m


def _dia_kernel(bands_ref, v_hbm, out_ref, *, offsets: Tuple[int, ...], moff: int):
	"""out[r] = Σ_d bands[d, r] · V[i·TILE + r + off_d] for one row tile."""
	i = pl.program_id(0)

	def body(scratch, sem):
		# V is pre-padded with `moff` zero rows on top, so the window start
		# i·TILE is always in range and the copy size is static.
		dma = pltpu.make_async_copy(
			v_hbm.at[pl.ds(i * TILE, TILE + 2 * moff), :], scratch, sem
		)
		dma.start()
		dma.wait()
		acc = jnp.zeros(out_ref.shape, out_ref.dtype)
		for d, off in enumerate(offsets):
			b = jnp.expand_dims(bands_ref[d, :], 1)  # (TILE, 1) broadcast over lanes
			acc += b * scratch[moff + off : moff + off + TILE]  # static slice
		out_ref[:] = acc

	pl.run_scoped(
		body,
		pltpu.VMEM((TILE + 2 * moff, out_ref.shape[1]), out_ref.dtype),
		pltpu.SemaphoreType.DMA(()),
	)


@partial(jax.jit, static_argnames=("offsets", "moff", "interpret"))
def dia_matmat_pallas(
	bands: jnp.ndarray,  # (n_d, n_pad) row-aligned bands, n_pad % TILE == 0
	Vp: jnp.ndarray,  # (moff + n_pad + moff, k) zero-padded probe block
	offsets: Tuple[int, ...],
	moff: int,
	interpret: bool = False,
) -> jnp.ndarray:
	n_d, n_pad = bands.shape
	k = Vp.shape[1]
	n_tiles = n_pad // TILE
	acc = jnp.promote_types(bands.dtype, jnp.float32)

	grid_spec = pl.GridSpec(
		grid=(n_tiles,),
		in_specs=[
			pl.BlockSpec((n_d, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
			pl.BlockSpec(memory_space=pltpu.ANY),  # V stays in HBM; manual DMA
		],
		out_specs=pl.BlockSpec((TILE, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
	)
	return pl.pallas_call(
		partial(_dia_kernel, offsets=offsets, moff=moff),
		grid_spec=grid_spec,
		out_shape=jax.ShapeDtypeStruct((n_pad, k), acc),
		interpret=interpret,
		cost_estimate=pl.CostEstimate(
			flops=2 * n_d * n_pad * k,
			bytes_accessed=(2 * n_pad * k + n_d * n_pad) * 4,
			transcendentals=0,
		),
	)(bands.astype(acc), Vp.astype(acc))


def dia_matmat(op, V: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
	"""SpMM ``op @ V`` for a :class:`DIAOperator` via the fused stencil kernel."""
	n = op.shape[0]
	V = jnp.asarray(V)
	single = V.ndim == 1
	if single:
		V = V[:, None]
	k = V.shape[1]
	if k % 128 != 0:
		# HBM DMA slices must be 128-lane aligned; padding k would multiply
		# every probe-block array (prohibitive at 10M rows). Lane-partial
		# probe blocks take the XLA path, which is equally bandwidth-bound.
		raise NotImplementedError("DIA Pallas kernel requires the probe count to be a multiple of 128.")
	n_pad = _round_up(n, TILE)
	moff = max((abs(o) for o in op.offsets), default=0)
	bands = op.bands
	if n_pad != n:
		bands = jnp.pad(bands, ((0, 0), (0, n_pad - n)))
	# One padded HBM copy of V: moff halo rows top and bottom (+ row padding).
	Vp = jnp.pad(V, ((moff, moff + (n_pad - V.shape[0])), (0, 0)))
	out = dia_matmat_pallas(bands, Vp, tuple(op.offsets), moff, interpret=interpret)
	out = out[:n, :k].astype(op.dtype)
	return out[:, 0] if single else out
