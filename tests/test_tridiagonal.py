"""Tridiagonal eigensolver tests (mirrors reference `tests/test_tridiagonal.py`)."""

import numpy as np
import primate_tpu as pt
from primate_tpu.tridiag import tqli, tridiag_matrix


def _random_tridiag(n, seed):
	rng = np.random.default_rng(seed)
	d = rng.uniform(size=n, low=-1.0, high=1.0)
	e = rng.uniform(size=n - 1, low=-1.0, high=1.0)
	return d, e


def test_eigh_tridiag_recovers_spectrum():
	d, e = _random_tridiag(30, 1234)
	T = np.diag(d) + np.diag(e, 1) + np.diag(e, -1)
	true_ew = np.linalg.eigvalsh(T)
	rw, Y = pt.eigh_tridiag(d, e)
	assert np.abs(np.sort(np.asarray(rw)) - true_ew).max() <= 1e-12
	# eigenvector orthonormality + reconstruction
	Y = np.asarray(Y)
	assert np.allclose(Y.T @ Y, np.eye(30), atol=1e-12)
	assert np.allclose(Y @ np.diag(np.asarray(rw)) @ Y.T, T, atol=1e-12)


def test_eigvalsh_tridiag_leading_zero_convention():
	d, e = _random_tridiag(12, 5)
	rw1 = np.sort(np.asarray(pt.eigvalsh_tridiag(d, e)))
	rw2 = np.sort(np.asarray(pt.eigvalsh_tridiag(d, np.append([0.0], e))))
	assert np.allclose(rw1, rw2)


def test_tqli_eigenvalues():
	d, e = _random_tridiag(16, 42)
	T = np.diag(d) + np.diag(e, 1) + np.diag(e, -1)
	true_ew = np.sort(np.linalg.eigvalsh(T))
	rw = np.sort(np.asarray(tqli(d, e, eigenvectors=False, maxiter=60)))
	assert np.abs(rw - true_ew).max() <= 1e-10


def test_tqli_eigenvectors():
	d, e = _random_tridiag(10, 7)
	T = np.diag(d) + np.diag(e, 1) + np.diag(e, -1)
	rw, Z = tqli(d, e, eigenvectors=True, maxiter=60)
	rw, Z = np.asarray(rw), np.asarray(Z)
	assert np.allclose(Z.T @ Z, np.eye(10), atol=1e-10)
	assert np.allclose(T @ Z, Z * rw[None, :], atol=1e-9)


def test_batched_tridiag():
	ds = np.stack([_random_tridiag(8, s)[0] for s in range(4)])
	es = np.stack([_random_tridiag(8, s)[1] for s in range(4)])
	rw = np.asarray(pt.eigvalsh_tridiag(ds, es))
	assert rw.shape == (4, 8)
	for i in range(4):
		T = np.asarray(tridiag_matrix(ds[i], es[i]))
		assert np.allclose(np.sort(rw[i]), np.linalg.eigvalsh(T), atol=1e-12)


def test_sign_transfer():
	"""`sign(a, b)` = |a|·sgn(b) — the intended semantics of the reference's
	helper (`tqli.py:5-7`), incl. the b ∈ (0, 1] range its expression got wrong."""
	from primate_tpu.tridiag import sign

	a = np.array([3.0, -3.0, 2.5, -2.5, 0.0])
	b = np.array([0.5, 0.5, -2.0, -2.0, 0.0])
	assert np.allclose(np.asarray(sign(a, b)), [3.0, 3.0, -2.5, -2.5, 0.0])
	assert float(sign(-4.0, 0.0)) == 4.0  # b == 0 treated as positive


def test_tqli_reference_calling_convention():
	"""Drop-in parity with the Pythran signature ``tqli(d, e, Z, max_iter)``
	(`tqli.py:15`, `tridiag.py:13`): a non-empty ndarray third argument selects
	eigenvector computation with in-place writeback into ``d`` and ``Z``; a
	size-0 ``Z`` means eigenvalues only."""
	d, e = _random_tridiag(10, 7)
	d, e = np.asarray(d, float), np.asarray(e, float)
	T = np.asarray(tridiag_matrix(d, e))
	true_w = np.linalg.eigvalsh(T)
	d_io, Z = d.copy(), np.zeros((10, 10))
	tqli(d_io, e.copy(), Z, 60)
	assert np.allclose(np.sort(d_io), true_w, atol=1e-10)
	for j in range(10):
		assert np.linalg.norm(T @ Z[:, j] - d_io[j] * Z[:, j]) < 1e-8
	d_io2 = d.copy()
	tqli(d_io2, e.copy(), np.empty(0), 60)
	assert np.allclose(np.sort(d_io2), true_w, atol=1e-10)
	# our keyword convention never mutates its inputs
	d_keep = d.copy()
	rw = np.asarray(tqli(d, e, eigenvectors=False, maxiter=60))
	assert np.allclose(np.sort(rw), true_w, atol=1e-10) and np.array_equal(d, d_keep)
