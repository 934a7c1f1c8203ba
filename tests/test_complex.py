"""Complex-Hermitian operator support (beyond the real-symmetric reference).

Quantum/tight-binding Hamiltonians — KPM's and SLQ's home turf — are complex
Hermitian. The Lanczos recurrence conjugates the bra side of every inner
product; α/β (hence the Jacobi matrix, quadrature, and all estimator state)
stay REAL, and probes stay real (unbiased: E[vvᵀ] = I and v†Av ∈ ℝ).
"""

import numpy as np
import jax.numpy as jnp

import primate_tpu as pt
from primate_tpu.lanczos import lanczos_block
from primate_tpu.random import hermitian
from primate_tpu.tridiag import eigvalsh_tridiag


def _herm(n, ew, seed):
	A = np.asarray(hermitian(n, ew=ew, seed=seed))
	assert np.allclose(A, A.conj().T)
	return jnp.asarray(A)


def test_hermitian_fixture_spectrum():
	ew = np.sort(np.random.default_rng(0).uniform(0.1, 2.0, 32))
	A = _herm(32, ew, seed=1)
	got = np.linalg.eigvalsh(np.asarray(A))
	assert np.allclose(got, ew, atol=1e-12)
	assert np.asarray(A).dtype == np.complex128


def test_lanczos_block_complex_recovers_spectrum():
	rng = np.random.default_rng(2)
	n = 40
	ew = rng.uniform(0.5, 2.0, n)
	A = _herm(n, ew, seed=3)
	v0 = jnp.asarray(rng.normal(size=(n, 3)) + 1j * rng.normal(size=(n, 3)))
	out = lanczos_block(lambda V: A @ V, v0, deg=n, ncv=n, orth=n)
	assert out.alphas.dtype == jnp.float64 and out.betas.dtype == jnp.float64
	for k in range(3):
		ev = np.sort(np.asarray(eigvalsh_tridiag(out.alphas[:, k], out.betas[:-1, k])))
		assert np.allclose(ev, np.sort(ew), atol=1e-10)
	# complex orthonormal basis: Q† Q = I per probe
	Q = np.asarray(out.Q)[:, :, 0]
	G = Q.conj() @ Q.T
	assert np.abs(G - np.eye(n)).max() < 1e-12


def test_matrix_function_matvec_complex():
	rng = np.random.default_rng(4)
	n = 48
	ew = rng.uniform(0.2, 1.5, n)
	A = _herm(n, ew, seed=5)
	lam, U = np.linalg.eigh(np.asarray(A))
	v = rng.normal(size=n) + 1j * rng.normal(size=n)
	for fun, f in [("exp", np.exp), ("log", np.log), (None, lambda x: x)]:
		FA = (U * f(lam)) @ U.conj().T
		M = pt.MatrixFunction(A, fun=fun, deg=n, orth=n)
		got = np.asarray(M @ jnp.asarray(v))
		assert np.abs(got - FA @ v).max() < 1e-10, fun
		# two-pass path agrees
		M2 = pt.MatrixFunction(A, fun=fun, deg=n, orth=n, two_pass=True)
		assert np.abs(np.asarray(M2 @ jnp.asarray(v)) - FA @ v).max() < 1e-10, fun


def test_quad_is_real_and_correct():
	rng = np.random.default_rng(6)
	n = 36
	ew = rng.uniform(0.3, 2.0, n)
	A = _herm(n, ew, seed=7)
	lam, U = np.linalg.eigh(np.asarray(A))
	logA = (U * np.log(lam)) @ U.conj().T
	X = rng.normal(size=(n, 5)) + 1j * rng.normal(size=(n, 5))
	M = pt.MatrixFunction(A, "log", deg=n, orth=n)
	q = np.asarray(M.quad(jnp.asarray(X)))
	assert q.dtype == np.float64  # real output for Hermitian operators
	want = np.einsum("ij,ij->j", X.conj(), logA @ X).real
	assert np.allclose(q, want, atol=1e-8)


def test_hutch_trace_complex():
	rng = np.random.default_rng(8)
	n = 96
	ew = rng.uniform(0.1, 1.0, n)
	A = _herm(n, ew, seed=9)
	est = pt.hutch(A, converge="count", count=512, seed=10)
	assert np.isrealobj(np.asarray(est)) or np.iscomplexobj(est) is False
	assert abs(float(est) - ew.sum()) <= 10 / np.sqrt(n) * np.sqrt(ew.sum())
	# logdet through MatrixFunction
	ld = pt.hutch(pt.MatrixFunction(A, "log", deg=24, orth=8), converge="count", count=1024, seed=11)
	assert abs(float(ld) - np.log(ew).sum()) / abs(np.log(ew).sum()) < 0.05


def test_diag_complex_real_output():
	rng = np.random.default_rng(12)
	n = 64
	A = _herm(n, rng.uniform(0.5, 1.5, n), seed=13)
	d = np.asarray(pt.diag(A, converge="count", count=3000, seed=14))
	assert d.dtype == np.float64
	assert np.abs(d - np.diag(np.asarray(A)).real).mean() < 0.05


def test_spectral_density_complex():
	rng = np.random.default_rng(15)
	n = 128
	ew = np.concatenate([rng.uniform(0.0, 0.5, n // 2), rng.uniform(1.5, 2.0, n // 2)])
	A = _herm(n, ew, seed=16)
	ts, phi = pt.spectral_density(A, deg=48, nv=8, seed=17)
	assert np.all(np.isfinite(phi))
	# two-lobe spectrum: density in the gap is far below the lobes
	gap = phi[(ts > 0.8) & (ts < 1.2)].mean()
	lobe = phi[(ts > 0.0) & (ts < 0.5)].mean()
	assert gap < 0.2 * lobe


def test_same_seed_real_vs_complex_independent_paths():
	"""A real matrix lifted to complex dtype gives the same hutch estimate."""
	n = 80
	ew = np.random.default_rng(18).uniform(0.2, 1.2, n)
	Ar = np.asarray(pt.symmetric(n, ew=ew, pd=True, seed=19))
	Ac = jnp.asarray(Ar.astype(np.complex128))
	er = pt.hutch(jnp.asarray(Ar), converge="count", count=256, seed=20)
	ec = pt.hutch(Ac, converge="count", count=256, seed=20)
	assert np.isclose(float(er), float(ec), rtol=1e-12)
