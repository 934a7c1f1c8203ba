"""Spectral function gallery tests (mirrors reference `tests/test_special.py`)."""

import numpy as np
import jax.numpy as jnp
import pytest
from primate_tpu.special import param_callable, smoothstep, softsign, step


def test_param_callable_builtins():
	x = jnp.linspace(0.1, 2.0, 16)
	assert np.allclose(np.asarray(param_callable("identity")(x)), np.asarray(x))
	assert np.allclose(np.asarray(param_callable("abs")(-x)), np.asarray(x))
	assert np.allclose(np.asarray(param_callable("sqrt")(x)), np.sqrt(np.asarray(x)))
	assert np.allclose(np.asarray(param_callable("inv")(x)), 1.0 / np.asarray(x))
	assert np.allclose(np.asarray(param_callable("exp", t=2.0)(x)), np.exp(2.0 * np.asarray(x)))


def test_log_clamps_at_eps():
	f = param_callable("log")
	y = np.asarray(f(jnp.asarray([0.0, -1.0, 1.0])))
	assert np.all(np.isfinite(y))
	assert np.isclose(y[2], 0.0)


def test_numrank_thresholding():
	f = param_callable("numrank", threshold=0.5)
	y = np.asarray(f(jnp.asarray([-1.0, -0.1, 0.1, 1.0])))
	assert np.allclose(y, [1.0, 0.0, 0.0, 1.0])  # nonnegative=True uses |x|


def test_smoothstep_endpoints():
	f = smoothstep(a=0.0, b=1.0)
	x = jnp.asarray([-1.0, 0.0, 0.5, 1.0, 2.0])
	y = np.asarray(f(x))
	assert np.allclose(y, [0.0, 0.0, 0.5, 1.0, 1.0])


def test_softsign_converges_to_sign():
	x = jnp.linspace(-1, 1, 21)
	y_lo = np.asarray(softsign(x, q=1))
	y_hi = np.asarray(softsign(x, q=50))
	s = np.sign(np.asarray(x))
	# odd function, and closer to sign(x) for larger q
	assert np.abs(y_hi - s)[np.abs(np.asarray(x)) > 0.3].max() < np.abs(y_lo - s)[np.abs(np.asarray(x)) > 0.3].max()
	assert np.allclose(y_hi, -y_hi[::-1], atol=1e-10)


def test_step():
	f = step(c=0.0)
	assert np.allclose(np.asarray(f(jnp.asarray([-1.0, 0.0, 1.0]))), [0.0, 1.0, 1.0])


def test_param_callable_rejects_unknown():
	with pytest.raises(ValueError):
		param_callable("not_a_function")


def test_param_callable_passthrough():
	g = lambda x: x + 1
	assert param_callable(g) is g


def test_smoothstep_higher_degree_real():
	"""Review r3f: deg selects the actual order-N smoothstep (the reference
	validates deg but always evaluates the cubic — consciously fixed)."""
	from primate_tpu.special import param_callable, smoothstep

	x = np.linspace(-0.5, 1.5, 201)
	s3 = np.asarray(smoothstep(x, a=0.0, b=1.0, deg=3))
	s5 = np.asarray(smoothstep(x, a=0.0, b=1.0, deg=5))
	y = np.clip(x, 0, 1)
	assert np.allclose(s3, 3 * y**2 - 2 * y**3, atol=1e-12)
	assert np.allclose(s5, 6 * y**5 - 15 * y**4 + 10 * y**3, atol=1e-12)
	assert not np.allclose(s3, s5)
	# edges: 0 at a, 1 at b, flat derivatives
	for s in (s3, s5):
		assert s[0] == 0.0 and s[-1] == 1.0
	# builtin path forwards deg
	f5 = param_callable("smoothstep", a=0.0, b=1.0, deg=5)
	assert np.allclose(np.asarray(f5(jnp.asarray(x))), s5, atol=1e-12)
