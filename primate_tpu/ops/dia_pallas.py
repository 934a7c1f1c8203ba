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
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dia_matmat", "dia_matmat_pallas", "dia_matmat_t", "dia_matmat_t_pallas"]

TILE = 2048  # rows per grid step (f32 sublane-aligned; moff must fit in one tile)

# --- probe-major stencil (lanes = rows, sublanes = probes) -------------------
#
# The Lanczos sweep carries its probe block (nv, n) PROBE-MAJOR, so the stencil
# shifts run along the contiguous lane axis. XLA's schedule for the
# shift-multiply-add DAG materializes a shifted copy of V per diagonal
# (~2 HBM round trips of the block per diagonal); this kernel streams V ONCE —
# each grid step double-buffer-DMAs its lane tile plus a 128-lane halo into
# VMEM while the previous tile computes, and all diagonals are fused into one
# VPU pass over the resident tile.

LANE_TILE = 2048  # lanes (rows) per grid step
HALO = 128  # lane-aligned halo each side; covers |offset| ≤ 128


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


def _dia_t_kernel(bands_ref, x_hbm, out_ref, scratch, sem, *, offsets: Tuple[int, ...], n_tiles: int):
	"""out[b, r] = Σ_d bands[d, r] · x[b, r + off_d] for one lane tile.

	``scratch``/``sem`` persist across grid steps: step j waits on buffer
	j%2 (started at step j−1) and prefetches buffer (j+1)%2 — the HBM read
	of the NEXT tile overlaps this tile's VPU stencil.
	"""
	j = pl.program_id(0)
	T = out_ref.shape[1]

	def get_dma(slot, idx):
		return pltpu.make_async_copy(
			x_hbm.at[:, pl.ds(idx * T, T + 2 * HALO)],
			scratch.at[slot],
			sem.at[slot],
		)

	@pl.when(j == 0)
	def _():
		get_dma(0, 0).start()

	@pl.when(j + 1 < n_tiles)
	def _():
		get_dma((j + 1) % 2, j + 1).start()

	get_dma(j % 2, j).wait()
	cur = scratch[j % 2]
	acc = jnp.zeros(out_ref.shape, out_ref.dtype)
	for d, off in enumerate(offsets):
		b = bands_ref[d, :][None, :]  # (1, T) broadcast over probes
		acc += b * cur[:, HALO + off : HALO + off + T]  # static lane slice
	out_ref[:, :] = acc


@partial(jax.jit, static_argnames=("offsets", "interpret"))
def dia_matmat_t_pallas(
	bands: jnp.ndarray,  # (n_d, n_pad) row-aligned bands, n_pad % LANE_TILE == 0
	Xp: jnp.ndarray,  # (nv, HALO + n_pad + HALO) zero-padded probe-major block
	offsets: Tuple[int, ...],
	interpret: bool = False,
) -> jnp.ndarray:
	n_d, n_pad = bands.shape
	nv = Xp.shape[0]
	n_tiles = n_pad // LANE_TILE
	acc = jnp.promote_types(bands.dtype, jnp.float32)

	return pl.pallas_call(
		partial(_dia_t_kernel, offsets=offsets, n_tiles=n_tiles),
		grid=(n_tiles,),
		in_specs=[
			pl.BlockSpec((n_d, LANE_TILE), lambda j: (0, j), memory_space=pltpu.VMEM),
			pl.BlockSpec(memory_space=pl.ANY),  # X stays in HBM; manual DMA
		],
		out_specs=pl.BlockSpec((nv, LANE_TILE), lambda j: (0, j), memory_space=pltpu.VMEM),
		out_shape=jax.ShapeDtypeStruct((nv, n_pad), acc),
		scratch_shapes=[
			pltpu.VMEM((2, nv, LANE_TILE + 2 * HALO), acc),
			pltpu.SemaphoreType.DMA((2,)),
		],
		interpret=interpret,
		cost_estimate=pl.CostEstimate(
			flops=2 * n_d * n_pad * nv,
			bytes_accessed=(2 * n_pad * nv + n_d * n_pad) * 4,
			transcendentals=0,
		),
	)(bands.astype(acc), Xp.astype(acc))


# --- physical (halo-padded) probe-major stencil ------------------------------
#
# The round-2 kernel above was measured ~2.2× faster than XLA's stencil in the
# BODY, but calling it inside a Lanczos `scan` carry required a halo pad of the
# input and an un-pad of the output PER STEP — two full HBM copies of the probe
# block that brought the 20-step chain back to parity. This variant removes the
# repack entirely: input and output share ONE physical layout
#
#     (nv, N_full),  N_full = HALO + N_dom + HALO,  N_dom = round_up(n, TILE)
#
# with the logical rows at lanes [HALO, HALO+n) and ZEROS everywhere else. The
# Lanczos sweep carries its whole state in this layout (zeros are invariant
# under the recurrence), so consecutive stencil applications chain with no
# layout change. The output's halo margins are re-zeroed in-kernel (two HALO-
# wide DMAs on the edge grid steps); the domain is written by manual async
# copies at lane offset HALO + j·TILE — 128-aligned, double-buffered so tile
# j+1's compute overlaps tile j's writeback.


def _dia_t_phys_kernel(
	bands_ref, x_hbm, out_hbm, scr_in, sem_in, scr_out, sem_out, zero_ref, sem_edge, *, offsets: Tuple[int, ...], n_tiles: int
):
	j = pl.program_id(0)
	T = bands_ref.shape[1]

	def in_dma(slot, idx):
		# Window [idx·T, idx·T + T + 2H) of the PHYSICAL array = logical lanes
		# [idx·T − H, idx·T + T + H) — always in range by construction.
		return pltpu.make_async_copy(
			x_hbm.at[:, pl.ds(idx * T, T + 2 * HALO)], scr_in.at[slot], sem_in.at[slot]
		)

	def out_dma(slot, idx):
		return pltpu.make_async_copy(
			scr_out.at[slot], out_hbm.at[:, pl.ds(HALO + idx * T, T)], sem_out.at[slot]
		)

	@pl.when(j == 0)
	def _():
		in_dma(0, 0).start()

	@pl.when(j + 1 < n_tiles)
	def _():
		in_dma((j + 1) % 2, j + 1).start()

	in_dma(j % 2, j).wait()
	cur = scr_in[j % 2]
	acc = jnp.zeros(scr_out.shape[1:], scr_out.dtype)
	for d, off in enumerate(offsets):
		b = bands_ref[d, :][None, :]  # (1, T) broadcast over probes
		acc += b * cur[:, HALO + off : HALO + off + T]  # static lane slice

	# Reuse of this output slot: wait for the copy started two steps ago.
	@pl.when(j >= 2)
	def _():
		out_dma(j % 2, j - 2).wait()

	scr_out[j % 2] = acc
	out_dma(j % 2, j).start()

	# Halo margins of the OUTPUT are never touched by the domain writes — zero
	# them explicitly so the result is a valid physical-layout array.
	@pl.when(j == 0)
	def _():
		zero_ref[...] = jnp.zeros(zero_ref.shape, zero_ref.dtype)
		left = pltpu.make_async_copy(zero_ref, out_hbm.at[:, pl.ds(0, HALO)], sem_edge.at[0])
		right = pltpu.make_async_copy(
			zero_ref, out_hbm.at[:, pl.ds(HALO + n_tiles * T, HALO)], sem_edge.at[1]
		)
		left.start()
		right.start()
		left.wait()
		right.wait()

	# Drain the outstanding domain writes before the kernel retires.
	@pl.when(j == n_tiles - 1)
	def _():
		@pl.when(n_tiles >= 2)
		def _():
			out_dma((j - 1) % 2, j - 1).wait()

		out_dma(j % 2, j).wait()


@partial(jax.jit, static_argnames=("offsets", "interpret"))
def dia_matmat_t_phys(
	bands_dom: jnp.ndarray,  # (n_d, N_dom) row-aligned bands, zero past n; N_dom % TILE == 0
	X_phys: jnp.ndarray,  # (nv, HALO + N_dom + HALO) physical-layout probe block
	offsets: Tuple[int, ...],
	interpret: bool = False,
) -> jnp.ndarray:
	"""Stencil apply in the physical layout: ``out[b, H+r] = Σ_d band_d[r] ·
	X[b, H + r + off_d]``, margins zeroed — same shape in, same shape out."""
	n_d, n_dom = bands_dom.shape
	nv = X_phys.shape[0]
	assert X_phys.shape[1] == n_dom + 2 * HALO, (X_phys.shape, n_dom)
	n_tiles = n_dom // LANE_TILE
	acc = jnp.promote_types(bands_dom.dtype, jnp.float32)

	return pl.pallas_call(
		partial(_dia_t_phys_kernel, offsets=offsets, n_tiles=n_tiles),
		grid=(n_tiles,),
		in_specs=[
			pl.BlockSpec((n_d, LANE_TILE), lambda j: (0, j), memory_space=pltpu.VMEM),
			pl.BlockSpec(memory_space=pl.ANY),  # X stays in HBM; manual DMA
		],
		out_specs=pl.BlockSpec(memory_space=pl.ANY),  # manual DMA at offset HALO + j·T
		out_shape=jax.ShapeDtypeStruct((nv, n_dom + 2 * HALO), acc),
		scratch_shapes=[
			pltpu.VMEM((2, nv, LANE_TILE + 2 * HALO), acc),
			pltpu.SemaphoreType.DMA((2,)),
			pltpu.VMEM((2, nv, LANE_TILE), acc),
			pltpu.SemaphoreType.DMA((2,)),
			pltpu.VMEM((nv, HALO), acc),
			pltpu.SemaphoreType.DMA((2,)),
		],
		interpret=interpret,
		cost_estimate=pl.CostEstimate(
			flops=2 * n_d * n_dom * nv,
			bytes_accessed=(2 * n_dom * nv + n_d * n_dom) * 4,
			transcendentals=0,
		),
	)(bands_dom.astype(acc), X_phys.astype(acc))


def dia_matmat_t(op, Xt: jnp.ndarray, interpret: Optional[bool] = None) -> jnp.ndarray:
	"""Probe-major SpMM ``(op @ Xtᵀ)ᵀ`` for a :class:`DIAOperator` — fused
	single-stream stencil kernel (|offsets| ≤ 128; the `matmat_t` dispatch
	routes wider bands to the node-major kernel instead).

	``interpret=None`` auto-selects interpreter mode off-TPU so the
	``use_pallas=True`` dispatch stays runnable (and testable) on CPU."""
	if interpret is None:
		interpret = jax.default_backend() != "tpu"
	n = op.shape[0]
	Xt = jnp.asarray(Xt)
	nv = Xt.shape[0]
	moff = max((abs(o) for o in op.offsets), default=0)
	if moff > HALO:
		raise NotImplementedError(f"DIA Pallas stencil covers |offset| ≤ {HALO}; got {moff}.")
	n_pad = _round_up(n, LANE_TILE)
	nv_pad = _round_up(max(nv, 8), 8)  # f32 sublane alignment
	bands = op.bands
	if n_pad != n:
		bands = jnp.pad(bands, ((0, 0), (0, n_pad - n)))
	Xp = jnp.pad(Xt, ((0, nv_pad - nv), (HALO, HALO + (n_pad - n))))
	out = dia_matmat_t_pallas(bands, Xp, tuple(op.offsets), interpret=interpret)
	return out[:nv, :n].astype(op.dtype)


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
