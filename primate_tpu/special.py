"""Spectral function gallery: builtin ``f`` for matrix functions ``f(A)``.

Parity: reference ``src/primate/special.py`` (builtin registry, softsign,
smoothstep, exp, step, param_callable).

Every builtin is a pure `jnp` function, so it traces into the fused estimator
programs (applied to quadrature nodes / Ritz values inside `jit`). Composing
these with the trace estimators yields logdet ("log"), tr(A⁻¹) ("inv"),
Estrada/heat-kernel ("exp"), numerical rank ("numrank"), Schatten norms
("sqrt"/"abs"), and eigenvalue counts ("smoothstep").
"""

from functools import lru_cache
from typing import Any, Callable, Optional, Union

import jax.numpy as jnp

__all__ = [
	"param_callable",
	"stacked",
	"softsign",
	"smoothstep",
	"exp",
	"step",
	"identity",
	"BUILTIN_MATRIX_FUNCTIONS",
]

BUILTIN_MATRIX_FUNCTIONS = ["identity", "abs", "sqrt", "log", "inv", "exp", "smoothstep", "numrank", "softsign"]


def identity(x: Any) -> Any:
	return x


def softsign(x: Optional[jnp.ndarray] = None, q: int = 1) -> Union[Callable, jnp.ndarray]:
	"""Smooth uniform approximation to sign(x) on [-1, 1].

	Degree-``q`` polynomial approximant (eq. (60) of "Stability of the Lanczos
	Method for Matrix Function Approximation"); converges to sgn(x) as q → ∞.
	"""
	import numpy as np

	I = np.arange(q + 1)
	J = np.append([1.0], np.cumprod([(2 * j - 1) / (2 * j) for j in np.arange(1, q + 1)]))
	Ic, Jc = jnp.asarray(I), jnp.asarray(J)

	def _softsign(x):
		x = jnp.clip(jnp.asarray(x), -1.0, 1.0)
		xt = jnp.atleast_1d(x)[..., None]  # (..., q+1) broadcast over terms
		return jnp.sum(xt * (1 - xt**2) ** Ic * Jc, axis=-1)

	return _softsign(x) if x is not None else _softsign


def smoothstep(
	x: Optional[jnp.ndarray] = None, a: float = 0.0, b: float = 1.0, deg: int = 3
) -> Union[Callable, jnp.ndarray]:
	"""Polynomial Hermite step: 0 below ``a``, 1 above ``b``, smooth in between.

	``deg = 2N+1`` selects the order-``N`` smoothstep ``S_N`` (N vanishing
	derivatives at both edges): deg=3 is the classic cubic ``3y²−2y³``, deg=5
	the quintic ``6y⁵−15y⁴+10y³``, etc. (The reference validates ``deg`` but
	always evaluates the cubic, `special.py:43-49` — consciously fixed here;
	higher degrees give flatter edges for eigencount windows.)
	"""
	assert (deg % 2) == 1, "Degree must be odd"
	d = (b - a) if a != b else 1.0
	N = (int(deg) - 1) // 2
	from math import comb

	coefs = [comb(N + k, k) * comb(2 * N + 1, N - k) * ((-1.0) ** k) for k in range(N + 1)]

	def _smoothstep(x):
		y = jnp.clip((jnp.asarray(x) - a) / d, 0.0, 1.0)
		acc = jnp.zeros_like(y)
		for c in reversed(coefs):  # Horner in y, then × y^{N+1}
			acc = acc * y + c
		return acc * y ** (N + 1)

	return _smoothstep(x) if x is not None else _smoothstep


def exp(x: Optional[jnp.ndarray] = None, t: float = 1.0) -> Union[Callable, jnp.ndarray]:
	"""Exponential ``x ↦ exp(t·x)`` (heat kernel / Estrada index weight)."""

	def _exp(x):
		return jnp.exp(t * jnp.asarray(x))

	return _exp(x) if x is not None else _exp


def step(x: Optional[jnp.ndarray] = None, c: float = 0.0, nonnegative: bool = False) -> Union[Callable, jnp.ndarray]:
	"""Hard threshold ``x ↦ 1[x ≥ c]`` (optionally on |x|) — numerical-rank weight."""

	def _step(x):
		x = jnp.asarray(x)
		x = jnp.abs(x) if nonnegative else x
		return jnp.where(x < c, 0.0, 1.0)

	return _step(x) if x is not None else _step


def _log_eps(x):
	# Clamp at machine eps so logdet-style quadratures never see log(<=0).
	return jnp.log(jnp.maximum(x, jnp.finfo(jnp.asarray(x).dtype).eps))


@lru_cache(maxsize=256)
def _cached_builtin(fun: str, kwargs_items: tuple) -> Callable:
	kwargs = dict(kwargs_items)
	if fun == "abs":
		return jnp.abs
	if fun == "sqrt":
		return jnp.sqrt
	if fun == "log":
		return _log_eps
	if fun == "inv":
		return jnp.reciprocal
	if fun == "exp":
		return exp(t=kwargs.pop("t", 1.0))
	if fun == "smoothstep":
		return smoothstep(a=kwargs.pop("a", 0.0), b=kwargs.pop("b", 1.0), deg=kwargs.pop("deg", 3))
	if fun == "softsign":
		return softsign(q=kwargs.pop("q", 10))
	if fun == "numrank":
		return step(c=kwargs.pop("threshold", 1e-6), nonnegative=True)
	raise ValueError(f"Unknown function: {fun}.")


@lru_cache(maxsize=256)
def _cached_stacked(fun: str, param: str, values: tuple, kwargs_items: tuple) -> Callable:
	fs = [param_callable(fun, **{param: v}, **dict(kwargs_items)) for v in values]

	def _stacked(x):
		return jnp.stack([f(x) for f in fs])

	_stacked.nout = len(fs)
	return _stacked


def stacked(fun: Union[str, Callable], values, param: str = "t", **kwargs) -> Callable:
	"""A STACKED spectral function: one callable evaluating a parameterized family.

	``stacked(fun, values)(x)[i] == fun(x, param=values[i])`` — the result gains
	one leading stack axis of length ``len(values)``. `MatrixFunction` (both
	``matvec`` and ``quad``), :func:`~primate_tpu.hutch`, and
	:func:`~primate_tpu.diag` all accept stacked functions and evaluate the
	whole family from **one** Lanczos sweep per probe batch: the quadrature
	nodes/weights (and the Krylov basis) do not depend on ``f``, so e.g.
	``tr(exp(-t·A))`` at 20 timepoints costs the same operator applications as
	at one. The reference's vector-valued-``fun`` support
	(`operators.py:63-66,91-97`) is the serial analog.

	``fun`` is a builtin name (parameter injected as ``param``, default "t") or
	a callable taking ``(x, value)``. Extra ``kwargs`` are fixed across the
	family. Builtin families are memoized so jitted estimator programs re-use
	their compilation across instances.
	"""
	import numpy as np

	vals = tuple(float(v) for v in np.atleast_1d(np.asarray(values)).ravel())
	if isinstance(fun, str):
		items = tuple(sorted(kwargs.items()))
		return _cached_stacked(fun, param, vals, items)
	assert callable(fun), "Matrix function must be a string or callable."

	def _stacked(x):
		return jnp.stack([fun(x, v) for v in vals])

	_stacked.nout = len(vals)
	return _stacked


def param_callable(fun: Union[str, Callable, None], **kwargs) -> Callable:
	"""Resolve a builtin function name (or passthrough callable) to a jnp callable.

	Parity: reference `special.py:78-107`, including the eps-clamp on "log".

	Builtins are MEMOIZED on (name, params): objects holding the callable in
	static/aux data (e.g. `MatrixFunction.tree_flatten`) compare equal across
	instances, so fused estimator programs re-use their compilation when only
	the matrix changes. A fresh closure per call would defeat the jit cache.
	"""
	if fun is None or fun == "identity":
		return identity
	if callable(fun):
		return fun
	assert isinstance(fun, str), "Matrix function must be a string or callable."
	known = {"t", "a", "b", "q", "threshold", "deg"}
	items = tuple(sorted((k, v) for k, v in kwargs.items() if k in known))
	return _cached_builtin(fun.lower(), items)
