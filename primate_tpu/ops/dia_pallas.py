"""Pallas TPU stencil SpMM for banded (DIA) operators.

The speed-of-light path for mesh/graph-Laplacian matvecs (BASELINE configs
2/4): all nonzero diagonals are fused into ONE pass over the probe block —
each output tile reads its own V tile plus the two neighbor tiles (the halo)
and performs the whole shift-multiply-add stencil on the VPU in VMEM. Compare:
the XLA path materializes a padded copy of V and streams it once per diagonal
slice; dense-block BSR inflates a band by ~bm·bn/band-fold.

Traffic per SpMM ≈ 3·|V| + |out| + |bands| (the 3× from whole-tile halos —
acceptable because the pipeline overlaps the redundant DMA with compute).

Constraint: max |offset| ≤ TILE rows (one neighbor tile each side). Wider
bands fall back to the XLA path. The clamped neighbor index maps are safe at
the global boundary because row-aligned band storage zeroes every
out-of-range entry, so clamped (wrong-tile) V rows always multiply 0.
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


def _dia_kernel(bands_ref, vm1_ref, v0_ref, vp1_ref, out_ref, *, offsets: Tuple[int, ...]):
	"""out[r] = Σ_d bands[d, r] · Vwin[TILE + r + off_d] for one row tile."""
	Vwin = jnp.concatenate([vm1_ref[:], v0_ref[:], vp1_ref[:]], axis=0)  # (3·TILE, k)
	acc = jnp.zeros(out_ref.shape, out_ref.dtype)
	for d, off in enumerate(offsets):
		b = jnp.expand_dims(bands_ref[d, :], 1)  # (TILE, 1) broadcast over lanes
		acc += b * Vwin[TILE + off : 2 * TILE + off]  # static slice (off is Python int)
	out_ref[:] = acc


@partial(jax.jit, static_argnames=("offsets", "interpret"))
def dia_matmat_pallas(
	bands: jnp.ndarray,  # (n_d, n_pad) row-aligned bands, n_pad % TILE == 0
	V: jnp.ndarray,  # (n_pad, k) probe block, k % 128 == 0
	offsets: Tuple[int, ...],
	interpret: bool = False,
) -> jnp.ndarray:
	n_d, n_pad = bands.shape
	k = V.shape[1]
	n_tiles = n_pad // TILE
	acc = jnp.promote_types(bands.dtype, jnp.float32)

	grid_spec = pl.GridSpec(
		grid=(n_tiles,),
		in_specs=[
			pl.BlockSpec((n_d, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
			pl.BlockSpec((TILE, k), lambda i: (jnp.maximum(i - 1, 0), 0), memory_space=pltpu.VMEM),
			pl.BlockSpec((TILE, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
			pl.BlockSpec((TILE, k), lambda i: (jnp.minimum(i + 1, n_tiles - 1), 0), memory_space=pltpu.VMEM),
		],
		out_specs=pl.BlockSpec((TILE, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
	)
	return pl.pallas_call(
		partial(_dia_kernel, offsets=offsets),
		grid_spec=grid_spec,
		out_shape=jax.ShapeDtypeStruct((n_pad, k), acc),
		interpret=interpret,
		cost_estimate=pl.CostEstimate(
			flops=2 * n_d * n_pad * k,
			bytes_accessed=(3 * n_pad * k + n_pad * k + n_d * n_pad) * 4,
			transcendentals=0,
		),
	)(bands.astype(acc), V.astype(acc), V.astype(acc), V.astype(acc))


def dia_matmat(op, V: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
	"""SpMM ``op @ V`` for a :class:`DIAOperator` via the fused stencil kernel."""
	n = op.shape[0]
	V = jnp.asarray(V)
	single = V.ndim == 1
	if single:
		V = V[:, None]
	k = V.shape[1]
	n_pad = _round_up(n, TILE)
	k_pad = max(_round_up(k, 128), 128)
	bands = op.bands
	if n_pad != n:
		bands = jnp.pad(bands, ((0, 0), (0, n_pad - n)))
	if n_pad != V.shape[0] or k_pad != k:
		V = jnp.pad(V, ((0, n_pad - V.shape[0]), (0, k_pad - k)))
	out = dia_matmat_pallas(bands, V, tuple(op.offsets), interpret=interpret)
	out = out[:n, :k].astype(op.dtype)
	return out[:, 0] if single else out
