"""Streaming statistics tests (mirrors reference `tests/test_stats.py`)."""

import numpy as np
import primate_tpu.stats as stats


def test_streaming_mean_matches_numpy_at_every_step():
	rng = np.random.default_rng(1234)
	x = rng.normal(size=120)
	m = stats.Mean()
	seen = []
	for chunk in np.array_split(x, 10):
		m.update(chunk)
		seen.extend(chunk)
		assert np.isclose(m(), np.mean(seen), atol=1e-12)


def test_streaming_cov_matches_numpy_at_every_step():
	rng = np.random.default_rng(1234)
	X = rng.normal(size=(90, 3))
	c = stats.Covariance(dim=3)
	seen = []
	for chunk in np.array_split(X, 9):
		c.update(chunk)
		seen.extend(chunk)
		if len(seen) > 1:
			ref = np.cov(np.asarray(seen).T, ddof=1)
			assert np.allclose(np.asarray(c(ddof=1)), ref, atol=1e-10)
			assert np.allclose(np.asarray(c.mu), np.mean(seen, axis=0), atol=1e-12)


def test_scalar_covariance_is_variance():
	rng = np.random.default_rng(5)
	x = rng.normal(size=64)
	c = stats.Covariance()
	c.update(x)
	assert np.isclose(c(), np.var(x, ddof=1), atol=1e-12)
	assert np.isclose(c(ddof=0), np.var(x, ddof=0), atol=1e-12)


def test_cov_underdetermined_is_inf():
	c = stats.Covariance()
	assert np.isinf(np.asarray(c()))
	c.update(np.asarray([1.0]))
	assert np.isinf(np.asarray(c(ddof=1)))


def test_functional_states_jittable():
	import jax

	@jax.jit
	def run(xs):
		st = stats.make_cov_state(1, xs.dtype)
		def body(st, x):
			return stats.cov_update(st, x[None, None]), None
		st, _ = jax.lax.scan(body, st, xs)
		return st.mu, stats.cov_matrix(st, ddof=1)

	import jax.numpy as jnp
	x = np.random.default_rng(3).normal(size=50)
	mu, cov = run(jnp.asarray(x))
	assert np.isclose(float(mu[0]), x.mean(), atol=1e-12)
	assert np.isclose(float(cov[0, 0]), np.var(x, ddof=1), atol=1e-10)


def test_confidence_interval_t_vs_normal():
	rng = np.random.default_rng(1234)
	a = rng.normal(size=200)
	lo_t, hi_t = stats.confidence_interval(a, 0.95, sdist="t")
	lo_n, hi_n = stats.confidence_interval(a, 0.95, sdist="normal")
	assert lo_t < a.mean() < hi_t
	# t and normal agree closely at n=200
	assert np.isclose(lo_t, lo_n, atol=1e-3) and np.isclose(hi_t, hi_n, atol=1e-3)


def test_streaming_state_only_widens_dtype():
	"""A lower-precision batch must not downcast the accumulated Welford state."""
	import jax.numpy as jnp

	from primate_tpu.stats import Covariance, Mean

	for cls in (Mean, Covariance):
		s = cls(dim=1, dtype=jnp.float64)
		s.update(np.ones((4, 1), np.float64))
		s.update(np.ones((4, 1), np.float32))
		assert s.mu.dtype == jnp.float64
		s32 = cls(dim=1, dtype=jnp.float32)
		s32.update(np.ones((4, 1), np.float64))  # widening is fine
		assert s32.mu.dtype == jnp.float64
