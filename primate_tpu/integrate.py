"""Gaussian quadrature rules from Jacobi (tridiagonal) matrices.

Parity: reference ``src/primate/integrate.py`` (`quadrature` with Golub-Welsch
and FTTR weight computation).

TPU-first: both methods are batched over a leading probe axis — the Lanczos
sweep produces nv Jacobi matrices at once, and the nodes/weights for all of
them come from one batched `jnp.linalg.eigh` (Golub-Welsch) or one vmapped
recurrence scan (FTTR). Everything is jittable, so stochastic Lanczos
quadrature traces as a single device program.
"""

from typing import Optional, Tuple

import jax.numpy as jnp

from .fttr import fttr_weights
from .tridiag import eigh_tridiag, eigvalsh_tridiag

__all__ = ["quadrature"]


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
		theta = eigvalsh_tridiag(d, e, **kwargs)
		tau = fttr_weights(theta, d, e, k=deg)
		theta = theta[..., :deg]
	else:
		raise ValueError(f"Invalid quadrature method '{quad}' supplied")

	if nodes is not None and weights is not None:
		nodes = jnp.asarray(nodes).at[...].set(theta)
		weights = jnp.asarray(weights).at[...].set(tau)
		return nodes, weights
	return theta, tau
