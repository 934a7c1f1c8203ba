"""Gaussian quadrature rules from Jacobi (tridiagonal) matrices.

Parity: reference ``src/primate/integrate.py`` (`quadrature` with Golub-Welsch
and FTTR weight computation).

TPU-first: both methods are batched over a leading probe axis — the Lanczos
sweep produces nv Jacobi matrices at once, and the nodes/weights for all of
them come from one batched `jnp.linalg.eigh` (Golub-Welsch) or one vmapped
recurrence scan (FTTR). Everything is jittable, so stochastic Lanczos
quadrature traces as a single device program.
"""

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .fttr import fttr_weights
from .tridiag import eigh_tridiag, eigvalsh_tridiag

__all__ = ["quadrature", "spectral_quad_form", "spectral_density"]


def spectral_density(*args, **kwargs):
	"""Alias for :func:`primate_tpu.density.spectral_density`.

	The reference plans this import location (commented
	``from .integrate import spectral_density, quadrature`` in its
	``__init__.py``); the implementation lives in `density.py`.
	"""
	from .density import spectral_density as _sd

	return _sd(*args, **kwargs)


@partial(jax.custom_jvp, nondiff_argnums=(2,))
def spectral_quad_form(d: jnp.ndarray, e: jnp.ndarray, fun: Callable) -> jnp.ndarray:
	"""``e₁ᵀ f(J(d, e)) e₁ = Σᵢ f(θᵢ) τᵢ`` with a degeneracy-stable derivative.

	Differentiating the Golub-Welsch rule naively goes through eigenvector
	derivatives, whose ``1/(θᵢ−θⱼ)`` terms produce NaN/∞ gradients the moment
	Ritz values cluster — routine for smooth kernels. This primitive's JVP is
	the Daleckii–Krein Fréchet derivative instead:

		d[e₁ᵀ f(J) e₁] = y₀ᵀ (L ∘ YᵀdJ Y) y₀,  L_ij = f[θᵢ, θⱼ]

	with the divided difference L_ij → f'(θᵢ) as θⱼ → θᵢ — finite for any
	clustering. Linear in the tangents, so reverse-mode transposes through it
	automatically (SLQ losses get stable gradients).

	``d (..., k)``, ``e (..., k-1)`` batched; returns ``(...,)``.
	"""
	theta, Y = eigh_tridiag(d, e)
	return jnp.sum(fun(theta) * Y[..., 0, :] ** 2, axis=-1)


@spectral_quad_form.defjvp
def _spectral_quad_form_jvp(fun, primals, tangents):
	d, e = primals
	dd, de = tangents
	theta, Y = eigh_tridiag(d, e)
	y0 = Y[..., 0, :]
	f_theta = fun(theta)
	val = jnp.sum(f_theta * y0**2, axis=-1)

	# Elementwise f' via forward-mode on the (vector-valued) spectral function.
	fp = jax.jvp(fun, (theta,), (jnp.ones_like(theta),))[1]
	diff = theta[..., :, None] - theta[..., None, :]
	fdiff = f_theta[..., :, None] - f_theta[..., None, :]
	scale = jnp.maximum(jnp.max(jnp.abs(theta), axis=-1, keepdims=True)[..., None], 1.0)
	near = jnp.abs(diff) <= 1e-7 * scale
	L = jnp.where(near, 0.5 * (fp[..., :, None] + fp[..., None, :]), fdiff / jnp.where(near, 1.0, diff))

	# (dJ Y) for tridiagonal dJ: rows get dd_k·Y_k + de_k·Y_{k+1} + de_{k-1}·Y_{k-1}.
	pad = jnp.zeros(de.shape[:-1] + (1,), de.dtype)
	lo = jnp.concatenate([de, pad], axis=-1)[..., :, None]  # de_k (k < deg-1)
	hi = jnp.concatenate([pad, de], axis=-1)[..., :, None]  # de_{k-1} (k > 0)
	Y_down = jnp.concatenate([Y[..., 1:, :], jnp.zeros_like(Y[..., :1, :])], axis=-2)
	Y_up = jnp.concatenate([jnp.zeros_like(Y[..., :1, :]), Y[..., :-1, :]], axis=-2)
	dJY = dd[..., :, None] * Y + lo * Y_down + hi * Y_up
	M = jnp.einsum("...ki,...kj->...ij", Y, dJY)
	tangent = jnp.einsum("...i,...ij,...j->...", y0, L * M, y0)
	return val, tangent


def quadrature(
	d: jnp.ndarray,
	e: jnp.ndarray,
	deg: Optional[int] = None,
	quad: str = "gw",
	nodes: Optional[jnp.ndarray] = None,
	weights: Optional[jnp.ndarray] = None,
	**kwargs,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
	r"""Degree-``deg`` Gaussian quadrature rule of the Jacobi matrix ``J(d, e)``.

	Nodes are the eigenvalues of ``J``; weights are the squared first components
	of its normalized eigenvectors (Golub-Welsch, ``quad="gw"``) or come from the
	forward three-term recurrence (``quad="fttr"``, O(1) space, not backward
	stable — see reference `integrate.py:50-55` for the tradeoff).

	``d (..., n)`` and ``e`` (length n with leading ≈0, or n-1) may carry batch
	axes; the rule is computed for every batch element on-device.

	The optional ``nodes``/``weights`` output arrays of the reference API are
	accepted for parity but, JAX arrays being immutable, the filled copies are
	returned rather than written in place.
	"""
	d, e = jnp.asarray(d), jnp.asarray(e)
	n = d.shape[-1]
	deg = n if deg is None else int(min(deg, n))
	# Normalize to the leading-zero convention used by the reference.
	if e.shape[-1] == n - 1:
		pad = jnp.zeros(e.shape[:-1] + (1,), e.dtype)
		e = jnp.concatenate([pad, e], axis=-1)
	assert e.shape[-1] == n, "Subdiagonal must have length n or n-1"

	if quad in {"gw", "golub_welsch"}:
		theta, ev = eigh_tridiag(d[..., :deg], e[..., :deg], **kwargs)
		tau = ev[..., 0, :] ** 2
	elif quad == "fttr":
		# Truncate the Jacobi matrix BEFORE solving (as the gw branch does):
		# the degree-deg rule comes from the leading deg×deg submatrix, and
		# nodes/weights must share its length.
		theta = eigvalsh_tridiag(d[..., :deg], e[..., :deg], **kwargs)
		tau = fttr_weights(theta, d[..., :deg], e[..., :deg], k=deg)
	else:
		raise ValueError(f"Invalid quadrature method '{quad}' supplied")

	if nodes is not None and weights is not None:
		nodes = jnp.asarray(nodes).at[...].set(theta)
		weights = jnp.asarray(weights).at[...].set(tau)
		return nodes, weights
	return theta, tau
