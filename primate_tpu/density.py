"""Spectral density (DOS) estimation by stochastic Lanczos quadrature.

Beyond-reference capability: the reference plots a cumulative spectral
measure from *known* eigenvalues (`plotting.py:7-29`) and its `__init__`
aspires to a `spectral_density` that never shipped (`__init__.py:10`). Here
it is a first-class estimator (Lin, Saad & Yang, SIAM Review 2016, §3.2):
each probe's Lanczos quadrature rule (θ, τ) is an unbiased sample of the
spectral measure; averaging Gaussian-broadened rules over probes gives the
smoothed density of states

	φ_σ(t) = (1/nv) Σ_v Σ_i τ_i^(v) · N(t; θ_i^(v), σ²),

evaluated on a fixed grid as one batched outer product — a single fused
device program per probe block.
"""

from typing import Optional, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from .integrate import quadrature
from .lanczos import lanczos_block_op
from .operators import aslinop
from .random import as_key, sample_isotropic

__all__ = ["spectral_density", "cumulative_spectral_density", "spectral_quantile"]


def _gauss(t: jnp.ndarray, mu: jnp.ndarray, sigma) -> jnp.ndarray:
	z = (t[None, :] - mu[:, None]) / sigma
	return jnp.exp(-0.5 * z * z) / (sigma * jnp.sqrt(2.0 * jnp.pi))


def spectral_density(
	A,
	grid: Union[int, jnp.ndarray] = 256,
	deg: int = 64,
	nv: int = 16,
	sigma: Optional[float] = None,
	bounds: Optional[Tuple[float, float]] = None,
	pdf: str = "rademacher",
	orth: int = 0,
	seed=None,
) -> Tuple[np.ndarray, np.ndarray]:
	"""Estimate the smoothed spectral density of symmetric ``A``.

	Returns ``(ts, phi)``: grid points and the Gaussian-broadened density,
	normalized so ``∫ phi dt ≈ 1`` (each eigenvalue carries mass 1/n).

	Parameters:
		A: symmetric operator (any :mod:`primate_tpu.operators` kind).
		grid: evaluation grid — an int (points spanning ``bounds``) or array.
		deg: Lanczos degree = quadrature nodes per probe (resolution).
		nv: number of probe vectors averaged.
		sigma: Gaussian broadening width; default ≈ grid span / deg.
		bounds: (min, max) of the grid; estimated from the extreme Ritz
			values (±5% inflation) when absent.
		pdf / orth / seed: as in :func:`~primate_tpu.hutch` / `lanczos`.
	"""
	op = aslinop(A)
	n = op.shape[0]
	deg = int(min(deg, n))
	orth = deg if (orth < 0 or orth > deg) else int(orth)  # same convention as lanczos()
	key = as_key(seed)
	V = sample_isotropic(key, (n, int(nv)), pdf=pdf, dtype=op.dtype)

	from .operators.sparse import GramOperator

	if isinstance(op, GramOperator):
		# Singular-value densities: Gram spectra go through Golub-Kahan
		# bidiagonalization of the data operator (κ(A) recurrence conditioning,
		# same matvec budget) — matching MatrixFunction.quad's dispatch.
		from .bidiag import bidiag_jacobi, lanczos_bidiag_op

		bdeg = int(min(deg, min(op.A.shape)))
		bout = lanczos_bidiag_op(
			op.A, V, deg=bdeg, orth=min(orth, bdeg), adjoint=not op.transpose_first
		)
		d, e = bidiag_jacobi(bout.alphas, bout.betas)
		nodes, weights = quadrature(d.T, e.T, deg=bdeg, quad="gw")  # (nv, bdeg) each
		nodes = jnp.maximum(nodes, 0.0)  # BᵀB is PSD; eigh may return −ε
	else:
		out = lanczos_block_op(op, V, deg=deg, ncv=max(2, min(max(orth, 2), deg)), orth=orth, return_basis=False)
		nodes, weights = quadrature(out.alphas.T, out.betas[: deg - 1].T, deg=deg, quad="gw")  # (nv, deg) each

	if bounds is None:
		lo = float(jnp.min(nodes))
		hi = float(jnp.max(nodes))
		pad = 0.05 * max(hi - lo, 1e-12)
		bounds = (lo - pad, hi + pad)
	ts = jnp.linspace(*bounds, int(grid)) if np.isscalar(grid) else jnp.asarray(grid)
	if sigma is None:
		sigma = float(ts[-1] - ts[0]) / max(deg, 8)

	# (nv·deg) broadened nodes against the grid in one batched outer product.
	phi = jnp.einsum("k,kt->t", weights.reshape(-1) / nv, _gauss(ts, nodes.reshape(-1), sigma))
	return np.asarray(ts), np.asarray(phi)


def cumulative_spectral_density(A, grid: Union[int, jnp.ndarray] = 256, **kwargs) -> Tuple[np.ndarray, np.ndarray]:
	"""Smoothed cumulative spectral measure ``Φ(t) = ∫_{-∞}^t φ`` on the grid.

	The estimator analog of the reference's ``figure_csm`` step CDF
	(`plotting.py:7-29`), computable without knowing the spectrum.
	"""
	ts, phi = spectral_density(A, grid=grid, **kwargs)
	dt = np.diff(ts, prepend=ts[0])
	csm = np.cumsum(phi * dt)
	return ts, csm


def spectral_quantile(A, q, grid: Union[int, jnp.ndarray] = 512, **kwargs):
	"""Spectrum quantiles: the value ``t`` with ``Φ(t) ≈ q·n`` (q in [0, 1]).

	Inverts the normalized cumulative spectral measure by monotone
	interpolation — matrix-free percentiles of the eigenvalue distribution
	(median eigenvalue, spectrum deciles, trimmed spectral ranges) without any
	eigendecomposition. ``q`` may be a scalar or an array of quantiles; extra
	kwargs reach :func:`spectral_density` (``deg``, ``nv``, ``sigma``,
	``seed``, ...).

	Resolution note: quantiles inherit the Gaussian broadening σ of the
	density — isolated eigenvalues are located to ~σ, and quantiles within
	O(1/nv) of 0 or 1 ride on Monte-Carlo noise in the CDF tails (use
	:func:`~primate_tpu.eigen.eigsh` for extremal eigenvalues instead).

	>>> lam_med = spectral_quantile(A, 0.5)
	>>> deciles = spectral_quantile(A, np.linspace(0.1, 0.9, 9))
	"""
	ts, csm = cumulative_spectral_density(A, grid=grid, **kwargs)
	total = float(csm[-1])
	assert total > 0 and np.isfinite(total), "Degenerate spectral measure (empty grid or NaN density)"
	cdf = np.asarray(csm) / total
	qs = np.atleast_1d(np.asarray(q, dtype=float))
	assert np.all((qs >= 0.0) & (qs <= 1.0)), "Quantiles must lie in [0, 1]"
	out = np.interp(qs, cdf, np.asarray(ts))
	return float(out[0]) if np.isscalar(q) or getattr(q, "ndim", 1) == 0 else out
