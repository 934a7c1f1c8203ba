"""Selective (ω-monitored partial) re-orthogonalization tests.

Beyond reference: the reference's C++ kernel re-orthogonalizes its window
unconditionally every step (`lanczos.h:132-136`); here the ω-recurrence keeps
semiorthogonality with a spectrum-adaptive trigger."""

import numpy as np
import jax.numpy as jnp
import primate_tpu as pt
from primate_tpu.lanczos import lanczos_block_op
from primate_tpu.operators import aslinop


def _spiky(n=200, seed=0):
	"""Dominant outlier eigenvalue — the fastest possible orthogonality loss."""
	rng = np.random.default_rng(seed)
	ew = rng.uniform(0.01, 1.0, n)
	ew[-1] = 50.0
	return np.asarray(pt.symmetric(n, pd=True, ew=ew, seed=1)), ew


def test_selective_matches_full_reorth_full_degree():
	"""Full-degree spectrum recovery with NO ghost duplicates — the acid test
	(orth=0 on this matrix produces dozens of ghost copies of λmax)."""
	A, ew = _spiky()
	n = A.shape[0]
	a, b = pt.lanczos(A, deg=n, seed=3, selective=True)
	ev = np.sort(np.asarray(pt.eigvalsh_tridiag(a, b)))
	assert np.abs(ev - np.sort(ew)).max() < 1e-10
	assert np.sum(np.abs(ev - 50.0) < 1e-6) == 1  # exactly one copy of the dominant eig

	a0, b0 = pt.lanczos(A, deg=n, seed=3, orth=0)
	ev0 = np.sort(np.asarray(pt.eigvalsh_tridiag(a0, b0)))
	assert np.sum(np.abs(ev0 - 50.0) < 1e-6) > 1  # without reorth: ghosts


def test_selective_trigger_rate_adapts_to_spectrum():
	rng = np.random.default_rng(0)
	n = 400
	rates = {}
	for name, ew in [
		("benign", rng.uniform(0.5, 2.0, n)),
		("spiky", np.concatenate([rng.uniform(0.01, 1.0, n - 1), [50.0]])),
	]:
		A = aslinop(jnp.asarray(np.asarray(pt.symmetric(n, pd=True, ew=ew, seed=1))))
		V0 = jnp.asarray(rng.normal(size=(n, 4)))
		out = lanczos_block_op(A, V0, deg=200, ncv=200, return_basis=False, selective=True)
		rates[name] = int(np.asarray(out.reorth_steps).sum())
	# a benign spectrum needs an order of magnitude fewer cleanings than a
	# spiky one (where a converged Ritz pair forces ~every-other-step reorth)
	assert rates["benign"] < 30, rates
	assert rates["spiky"] > 60, rates
	assert rates["benign"] * 3 < rates["spiky"], rates


def test_selective_trace_is_none_when_off():
	A, _ = _spiky(60)
	op = aslinop(jnp.asarray(A))
	V0 = jnp.ones((60, 2))
	out = lanczos_block_op(op, V0, deg=20, ncv=8, orth=4, return_basis=False)
	assert out.reorth_steps is None


def test_selective_batched_probes_and_rayleigh_ritz():
	A, ew = _spiky(150)
	v0 = np.random.default_rng(5).normal(size=(150, 8))
	a, b = pt.lanczos(A, v0=v0, deg=150, selective=True)
	assert a.shape == (150, 8)
	for p in range(8):
		ev = np.sort(np.asarray(pt.eigvalsh_tridiag(a[:, p], b[:, p])))
		assert np.abs(ev - np.sort(ew)).max() < 1e-9
	rw = pt.rayleigh_ritz(A, deg=150, selective=True, seed=2)
	assert abs(np.max(np.asarray(rw)) - 50.0) < 1e-10
