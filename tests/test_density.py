"""Spectral density estimation vs the exact broadened spectrum."""

import numpy as np
import pytest

import primate_tpu as pt
from primate_tpu.density import cumulative_spectral_density, spectral_density


def _exact_density(ts, ew, sigma):
	z = (ts[None, :] - ew[:, None]) / sigma
	return (np.exp(-0.5 * z * z) / (sigma * np.sqrt(2 * np.pi))).mean(axis=0)


def test_density_matches_broadened_spectrum():
	n = 128
	ew = np.random.default_rng(0).uniform(0.0, 2.0, n)
	A = pt.symmetric(n, ew=ew, seed=0)
	ts, phi = spectral_density(A, grid=200, deg=64, nv=32, sigma=0.1, bounds=(-0.5, 2.5), orth=-1, seed=1)
	exact = _exact_density(ts, ew, 0.1)
	# L1 distance between densities, normalized by total mass
	dt = ts[1] - ts[0]
	l1 = np.abs(phi - exact).sum() * dt
	assert l1 < 0.12, l1
	# mass ≈ 1
	assert abs(phi.sum() * dt - 1.0) < 0.05


def test_density_bimodal_spectrum():
	n = 100
	ew = np.r_[np.random.default_rng(1).normal(-2.0, 0.1, 50), np.random.default_rng(2).normal(2.0, 0.1, 50)]
	A = pt.symmetric(n, ew=ew, seed=3)
	ts, phi = spectral_density(A, grid=300, deg=40, nv=16, sigma=0.15, bounds=(-3.5, 3.5), orth=-1, seed=4)
	mid = (ts > -1) & (ts < 1)
	# two modes: density near ±2 far exceeds the gap density
	assert phi[np.abs(ts + 2) < 0.2].mean() > 10 * phi[mid].mean()
	assert phi[np.abs(ts - 2) < 0.2].mean() > 10 * phi[mid].mean()


def test_cumulative_density_monotone_and_bounded():
	A = pt.symmetric(64, pd=True, seed=5)
	ts, csm = cumulative_spectral_density(A, grid=128, deg=48, nv=8, orth=-1, seed=6)
	assert np.all(np.diff(csm) >= -1e-9)
	assert 0.9 < csm[-1] < 1.1


def test_density_auto_bounds_cover_spectrum():
	ew = np.random.default_rng(7).uniform(1.0, 3.0, 80)
	A = pt.symmetric(80, ew=ew, seed=7)
	ts, phi = spectral_density(A, deg=40, nv=8, orth=-1, seed=8)
	assert ts[0] <= 1.05 and ts[-1] >= 2.95


def test_singular_value_density_via_gram_gkl():
	"""DOS of a Gram operator routes through GKL: the density mass sits on the
	squared singular values of the data matrix."""
	import primate_tpu as pt
	from primate_tpu.operators.sparse import GramOperator

	import jax.numpy as jnp

	rng = np.random.default_rng(7)
	A = rng.standard_normal((80, 30))
	s2 = np.linalg.svd(A, compute_uv=False) ** 2
	ts, phi = pt.spectral_density(GramOperator(jnp.asarray(A)), deg=30, nv=16, orth=-1, seed=1)
	assert np.all(np.isfinite(phi)) and np.all(ts >= -1e-6)
	# mass normalizes to ~1 and the mean of the density matches E[sigma^2]/n
	dt = np.diff(ts, prepend=ts[0])
	mass = float(np.sum(phi * dt))
	mean_est = float(np.sum(ts * phi * dt) / mass)
	assert abs(mass - 1.0) < 0.1
	assert abs(mean_est - s2.mean()) / s2.mean() < 0.2


def test_spectral_quantile_uniform_spectrum():
	"""Prescribed uniform spectrum on [0, 1]: quantile(q) ≈ q."""
	n = 256
	ew = (np.arange(n) + 0.5) / n
	A = pt.symmetric(n, ew=ew, seed=1)
	qs = np.asarray([0.25, 0.5, 0.75])
	t = pt.spectral_quantile(A, qs, deg=64, nv=32, seed=3)
	assert np.all(np.abs(t - qs) < 0.08)
	# scalar in, scalar out
	med = pt.spectral_quantile(A, 0.5, deg=64, nv=32, seed=3)
	assert isinstance(med, float) and abs(med - 0.5) < 0.08


def test_spectral_quantile_bimodal():
	"""Two well-separated clusters: the median sits between them, the 0.2/0.8
	quantiles inside the clusters."""
	n = 200
	ew = np.concatenate([np.full(n // 2, 1.0), np.full(n // 2, 5.0)])
	ew += np.random.default_rng(5).normal(0, 0.02, n)
	A = pt.symmetric(n, ew=ew, seed=7)
	lo = pt.spectral_quantile(A, 0.2, deg=48, nv=32, seed=9)
	hi = pt.spectral_quantile(A, 0.8, deg=48, nv=32, seed=9)
	assert abs(lo - 1.0) < 0.3 and abs(hi - 5.0) < 0.3
