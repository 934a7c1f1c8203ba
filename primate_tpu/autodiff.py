r"""Differentiable spectral sums: ``jax.grad`` through stochastic trace estimates.

The reference library is numpy-only and has no gradients; its fused JAX rebuild
should. The adaptive estimators (`hutch`'s ``lax.while_loop``) are not
reverse-differentiable by construction, so this module provides the fixed-budget
SLQ trace path as a :func:`jax.custom_vjp` whose backward pass uses the matrix
calculus identity instead of unrolling the Lanczos recurrence:

    ∂ tr f(A) = tr(f'(A) ∂A),   estimated by   (1/m) Σᵢ wᵢᵀ (∂A) zᵢ,
    wᵢ = f'(A) zᵢ

with the probes ``zᵢ`` SHARED between the forward estimate and the gradient.
For ``f = log`` (the GP log-marginal-likelihood workload, BASELINE config 5)
``f'(A)zᵢ = A⁻¹zᵢ`` comes from the existing batched CG solver
(:func:`primate_tpu.solvers.cg`, Nyström/Jacobi-preconditionable); for any
other traceable spectral function, ``f'`` is derived automatically with
``jax.grad`` and applied through a second Lanczos ``MatrixFunction`` sweep.
The cotangent reaches the operator's pytree leaves via ``jax.vjp`` of its own
``matmat``, so every operator format (dense, CSR/BSR/DIA, affine, sharded,
function-defined) is differentiable for free.

**Estimator-gradient variance caveat.** The returned gradient is an unbiased
stochastic estimate of ∇ tr f(A) built from the same probes as the forward
value — it is *not* the exact derivative of the stochastic forward value
(those differ by a zero-mean term involving the Fréchet derivative of ``f``;
see Gardner et al., GPyTorch, NeurIPS 2018 for the same convention). Variance
scales like 1/m in the probe count; for optimization, resample probes across
steps (fold the iteration index into ``seed``) so the noise averages out.

Reference parity: this axis is NEW relative to `/root/reference` (numpy, no
autodiff) — it is the "JAX-native axis still missing" named by the round-3
review. Public surface: :func:`spectral_sum`, :func:`logdet`,
:func:`trace_inv`, plus ``differentiable=True`` on :func:`primate_tpu.hutch`.
"""

from functools import lru_cache
from typing import Callable, Optional, Union

import numpy as np
import jax
import jax.numpy as jnp

from .operators import aslinop
from .operators.special_ops import MatrixFunction
from .random import as_key, real_dtype, sample_isotropic
from .special import _log_eps

__all__ = ["spectral_sum", "logdet", "trace_inv"]


def _elementwise_grad(f: Callable) -> Callable:
	"""Derivative of an elementwise spectral function, via jax autodiff.

	Spectral functions act elementwise on (batched) eigenvalue arrays, so
	``grad(sum ∘ f)`` recovers the elementwise derivative for any shape.
	"""
	df = jax.grad(lambda x: jnp.sum(f(x)))

	def fprime(x):
		return df(jnp.asarray(x, jnp.promote_types(jnp.asarray(x).dtype, jnp.float32)))

	return fprime


def _is_log(fun: Callable) -> bool:
	# `_log_eps` is what `MatrixFunction(..., fun="log")` resolves to.
	return fun is _log_eps or fun is jnp.log


def _is_inv(fun: Callable) -> bool:
	return fun is jnp.reciprocal


@lru_cache(maxsize=64)
def _spectral_sum_core(fprime, grad_method: str, solver_rtol: float, solver_maxiter: Optional[int]):
	"""custom_vjp estimator factory, memoized on the gradient configuration.

	The differentiable inputs are ``(M, Z)`` — the :class:`MatrixFunction`
	pytree (operator leaves inside) and the probe block. Everything static
	(fun, deg, orth) rides in ``M``'s aux data, so one cached instance serves
	every operator of a given gradient configuration and jit caching works.

	``maxsize=64`` (not unbounded): ``fprime`` is keyed by callable identity,
	and a training loop that builds a fresh ``fprime`` lambda every step would
	otherwise retain every instance (and its jit cache) forever. Pass a
	STABLE callable (module-level function / cached closure) to reuse
	compilations across calls — same rule as ``MatrixFunction(fun=...)``.
	"""

	@jax.custom_vjp
	def estimate(M, Z):
		return jnp.mean(M.quad(Z), axis=-1)

	def fwd(M, Z):
		return estimate(M, Z), (M, Z)

	def bwd(res, gbar):
		M, Z = res
		_check_grad_supported(M, gbar)
		Zc = Z.astype(M.dtype)
		W = _apply_fprime(M, Zc, fprime, grad_method, solver_rtol, solver_maxiter)
		# ∂̂ = (gbar/m) Σᵢ wᵢ zᵢᵀ pulled back through the operator's own matmat:
		# tr(Wᵀ (∂A) Z)/m = (1/m) Σᵢ wᵢᵀ (∂A) zᵢ — jax.vjp routes the cotangent
		# into whatever pytree leaves parameterize A (dense entries, CSR data,
		# DIA bands, kernel hyperparameters upstream, ...).
		_, pull = jax.vjp(lambda m: m.operator.matmat(Zc), M)
		(M_bar,) = pull((gbar / Z.shape[-1]) * W.astype(M.dtype))
		return M_bar, jnp.zeros_like(Z)

	estimate.defvjp(fwd, bwd)
	return estimate


def _check_grad_supported(M, gbar) -> None:
	if jnp.dtype(M.dtype).kind == "c":
		raise NotImplementedError(
			"spectral_sum gradients are real-symmetric only; for Hermitian operators "
			"differentiate through the real embedding [[Re, -Im], [Im, Re]]."
		)
	if jnp.ndim(gbar) != 0:
		raise NotImplementedError(
			"spectral_sum gradients need a scalar spectral function; stacked families "
			"(special.stacked) are forward-only — estimate each member separately to differentiate."
		)


def _apply_fprime(M, Zc, fprime, grad_method: str, solver_rtol: float, solver_maxiter) -> jnp.ndarray:
	"""``W = f'(A) Z``: CG for log/inv, a second Lanczos sweep otherwise."""
	A = M.operator
	fun = M.fun
	method = grad_method
	if method == "auto":
		method = "cg" if (_is_log(fun) or _is_inv(fun)) and fprime is None else "slq"
	if method == "cg":
		from .solvers import cg

		if not (_is_log(fun) or _is_inv(fun)):
			raise ValueError(
				"grad_method='cg' applies only to fun='log' (f' = A⁻¹) or fun='inv' "
				"(f' = -A⁻²); pass fprime= or grad_method='slq' for other functions."
			)
		W = cg(A, Zc, rtol=solver_rtol, maxiter=solver_maxiter)
		if _is_inv(fun):
			W = -cg(A, W, rtol=solver_rtol, maxiter=solver_maxiter)
		return W
	fp = fprime if fprime is not None else _elementwise_grad(fun)
	Mp = MatrixFunction(
		A,
		fun=fp,
		deg=M.degree,
		orth=M._orth,
		dtype=M.dtype,
		two_pass=M._two_pass,
		reorth_passes=M._reorth_passes,
		basis_dtype=M._basis_dtype,
	)
	return Mp._matmat(Zc)


@lru_cache(maxsize=64)
def _spectral_sum_chunked_core(
	fprime, grad_method: str, solver_rtol: float, solver_maxiter: Optional[int], pdf: str, nchunks: int, chunk: int
):
	"""Chunked custom_vjp estimator: O(n·chunk) peak memory at any probe budget.

	Probes are sampled per chunk inside a ``lax.map``/``lax.scan`` body from a
	chunk-indexed key (``fold_in(key, i)``), so neither the forward quad nor
	the backward ``f'(A)Z`` + cotangent accumulation ever materializes the
	full ``(n, nchunks·chunk)`` block — the fix for review r4: a migrated
	``hutch(batch=32, count=4096, differentiable=True)`` at n=500k would
	otherwise allocate ~8 GB per pass. Differentiable input is the operator
	pytree; the key rides as raw uint32 data (cotangent: float0 zeros).
	"""

	def chunk_probes(M, key, i):
		return sample_isotropic(jax.random.fold_in(key, i), (M.shape[0], chunk), pdf=pdf, dtype=real_dtype(M.dtype))

	@jax.custom_vjp
	def estimate(M, key_data):
		key = jax.random.wrap_key_data(key_data)

		def one(i):
			return jnp.mean(M.quad(chunk_probes(M, key, i)), axis=-1)

		return jnp.mean(jax.lax.map(one, jnp.arange(nchunks)), axis=0)

	def fwd(M, key_data):
		return estimate(M, key_data), (M, key_data)

	def bwd(res, gbar):
		M, key_data = res
		_check_grad_supported(M, gbar)
		key = jax.random.wrap_key_data(key_data)
		coef = gbar / (nchunks * chunk)

		# The scan carry accumulates ONLY the inexact (differentiable) leaves:
		# integer leaves (CSR indices, BSR row/col ids, ...) get float0
		# cotangents from jax.vjp, which support no arithmetic by design — they
		# are reattached as float0 zeros after the loop.
		leaves, tdef = jax.tree_util.tree_flatten(M)
		diff_idx = [i for i, leaf in enumerate(leaves) if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.inexact)]

		def step(acc, i):
			Zc = chunk_probes(M, key, i).astype(M.dtype)
			W = _apply_fprime(M, Zc, fprime, grad_method, solver_rtol, solver_maxiter)
			_, pull = jax.vjp(lambda m: m.operator.matmat(Zc), M)
			(mbar,) = pull(coef * W.astype(M.dtype))
			mleaves = jax.tree_util.tree_leaves(mbar)
			return tuple(a + mleaves[j] for a, j in zip(acc, diff_idx)), None

		acc0 = tuple(jnp.zeros_like(leaves[i]) for i in diff_idx)
		accf, _ = jax.lax.scan(step, acc0, jnp.arange(nchunks))
		out_leaves = []
		k = 0
		for i, leaf in enumerate(leaves):
			if k < len(diff_idx) and i == diff_idx[k]:
				out_leaves.append(accf[k])
				k += 1
			else:
				out_leaves.append(np.zeros(np.shape(leaf), jax.dtypes.float0))
		return jax.tree_util.tree_unflatten(tdef, out_leaves), np.zeros(np.shape(key_data), jax.dtypes.float0)

	estimate.defvjp(fwd, bwd)
	return estimate


def spectral_sum(
	A,
	fun: Union[str, Callable, None] = None,
	deg: int = 20,
	orth: int = 3,
	nv: int = 64,
	pdf: str = "rademacher",
	seed=None,
	fprime: Optional[Callable] = None,
	grad_method: str = "auto",
	solver_rtol: float = 1e-6,
	solver_maxiter: Optional[int] = None,
	dtype=None,
	chunk: Optional[int] = None,
	**fun_kwargs,
) -> jnp.ndarray:
	r"""Differentiable stochastic estimate of ``tr(f(A))`` (fixed probe budget).

	Fully traceable: composes with ``jax.jit``, ``jax.grad``, ``jax.value_and_grad``
	and vmapped outer loops. Forward = stochastic Lanczos quadrature on ``nv``
	shared probes (the same math as ``hutch(MatrixFunction(A, fun),
	converge='count')``, in one fused block); backward = the
	``tr(f'(A)·∂A)`` identity above — no differentiation through the Lanczos
	recurrence, O(n·nv) memory.

	Parameters:
		A: operator / matrix (anything :func:`aslinop` accepts), or an existing
			:class:`MatrixFunction` (its ``fun``/``deg``/``orth`` are used).
		fun: spectral function name or jnp-traceable callable.
		deg, orth: Lanczos degree / re-orthogonalization window.
		nv: probe count (the full budget runs as ONE batched block).
		pdf: probe distribution ("rademacher"/"normal"/"sphere").
		seed: int / numpy Generator / JAX key; fold the optimizer step index in
			(``jax.random.fold_in``) to resample probes across training steps.
		fprime: optional explicit derivative callable (else automatic). Pass a
			STABLE callable across calls — the custom_vjp factory is memoized on
			its identity, so a fresh lambda per call retraces every time.
		grad_method: "auto" (CG for log/inv, else SLQ), "cg", or "slq".
		solver_rtol, solver_maxiter: CG controls for the gradient solves.
		chunk: process probes in ``(n, chunk)`` blocks inside a scan — peak
			memory O(n·chunk) in both passes instead of O(n·nv) (budget rounds
			up to whole chunks; probe stream differs from the unchunked path).

	Returns a 0-d ``jnp.ndarray`` (keeps gradients flowing — call ``float()``
	on the host side if you want a Python scalar).
	"""
	if isinstance(A, MatrixFunction):
		M = A
	else:
		M = MatrixFunction(aslinop(A, dtype=dtype), fun=fun, deg=deg, orth=orth, dtype=dtype, **fun_kwargs)
	key = as_key(seed)
	nv = int(nv)
	if chunk is not None and int(chunk) < nv:
		# Chunked path: probes processed in (n, chunk) blocks inside a scan —
		# O(n·chunk) peak memory in BOTH passes. The budget rounds UP to whole
		# chunks (matching hutch's batch semantics); the probe stream differs
		# from the single-block path (per-chunk fold_in keys).
		chunk = int(chunk)
		nchunks = -(-nv // chunk)
		core = _spectral_sum_chunked_core(
			fprime, grad_method, float(solver_rtol), solver_maxiter, pdf, nchunks, chunk
		)
		return core(M, jax.random.key_data(key))
	Z = sample_isotropic(key, (M.shape[0], nv), pdf=pdf, dtype=real_dtype(M.dtype))
	core = _spectral_sum_core(fprime, grad_method, float(solver_rtol), solver_maxiter)
	return core(M, Z)


def logdet(
	A,
	deg: int = 20,
	orth: int = 5,
	nv: int = 64,
	seed=None,
	solver_rtol: float = 1e-6,
	solver_maxiter: Optional[int] = None,
	**kwargs,
) -> jnp.ndarray:
	r"""Differentiable ``log det(A)`` for SPD ``A``: SLQ forward, CG-based gradient.

	``∂ logdet(A) = tr(A⁻¹ ∂A)`` estimated with the forward pass's Rademacher
	probes and batched preconditionable CG — the standard stochastic gradient
	for GP hyperparameter learning. See :func:`spectral_sum` for the variance
	caveat; the non-differentiable, adaptive-budget spelling lives at
	:func:`primate_tpu.recipes.logdet`.
	"""
	return spectral_sum(
		A, "log", deg=deg, orth=orth, nv=nv, seed=seed,
		solver_rtol=solver_rtol, solver_maxiter=solver_maxiter, **kwargs,
	)


def trace_inv(
	A,
	deg: int = 20,
	orth: int = 5,
	nv: int = 64,
	seed=None,
	solver_rtol: float = 1e-6,
	solver_maxiter: Optional[int] = None,
	**kwargs,
) -> jnp.ndarray:
	r"""Differentiable ``tr(A⁻¹)``: SLQ forward, ``∂ tr(A⁻¹) = -tr(A⁻²∂A)`` backward
	(two chained CG solves per probe block)."""
	return spectral_sum(
		A, "inv", deg=deg, orth=orth, nv=nv, seed=seed,
		solver_rtol=solver_rtol, solver_maxiter=solver_maxiter, **kwargs,
	)
