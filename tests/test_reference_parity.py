"""Direct numerical parity against the REFERENCE implementation.

Loads the reference's pure-Python Lanczos recurrence (`_lanczos_recurrence` /
`_orth_vector`, `src/primate/lanczos.py:172-238`) straight from the reference
checkout AT TEST TIME (nothing is copied into this repo; the reference package
itself cannot be imported — its `__init__` needs the compiled `_lanczos`
extension) and checks that our batched `lax.scan` sweep produces the same
Jacobi matrices on the same inputs. This pins the semantics the SURVEY calls
out: β-coupled three-term recurrence, windowed re-orth, √n·rtol early exit.
"""

import ast
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

import primate_tpu as pt

REF = Path("/root/reference/src/primate/lanczos.py")

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference checkout not available")


def _load_reference_recurrence():
	"""Exec just the two pure-Python kernel functions from the reference file."""
	tree = ast.parse(REF.read_text())
	keep = [n for n in tree.body if isinstance(n, ast.FunctionDef) and n.name in ("_orth_vector", "_lanczos_recurrence")]
	mod = ast.Module(body=keep, type_ignores=[])
	ns = {"np": np, "typing": __import__("typing")}
	exec(compile(ast.fix_missing_locations(mod), str(REF), "exec"), ns)
	return ns["_lanczos_recurrence"]


def test_lanczos_jacobi_matches_reference_recurrence():
	"""Same (A, v0, deg, full reorth) → same (α, β) to f64 round-off."""
	ref_recurrence = _load_reference_recurrence()
	rng = np.random.default_rng(1234)
	n, deg = 80, 30
	ew = np.sort(rng.uniform(0.1, 2.0, n))
	A = np.asarray(pt.symmetric(n, ew=ew, seed=1), dtype=np.float64)
	v0 = rng.standard_normal(n)

	a_ref, b_ref, _ = ref_recurrence(A, v0, deg, 1e-8, deg, None, deg)
	a_ours, b_ours = pt.lanczos(A, v0=v0, deg=deg, orth=-1)
	# b_ref is [0, β_1..β_deg−1] (leading structural zero); ours is β_1..β_deg.
	assert np.allclose(np.asarray(a_ours), a_ref, atol=1e-10)
	assert np.allclose(np.asarray(b_ours)[: deg - 1], b_ref[1:deg], atol=1e-10)


def test_lanczos_ritz_values_match_reference_windowed():
	"""Windowed re-orth (orth=4): the recurrences diverge vector-by-vector in
	finite precision, but both must recover the spectrum at full degree."""
	ref_recurrence = _load_reference_recurrence()
	rng = np.random.default_rng(5678)
	n = 50
	ew = np.sort(rng.uniform(0.5, 3.0, n))
	A = np.asarray(pt.symmetric(n, ew=ew, seed=2), dtype=np.float64)
	v0 = rng.standard_normal(n)

	a_ref, b_ref, _ = ref_recurrence(A, v0, n, 1e-10, n, None, n)
	rw_ref = np.sort(np.linalg.eigvalsh(np.diag(a_ref) + np.diag(b_ref[1:], 1) + np.diag(b_ref[1:], -1)))
	rw_ours = np.sort(np.asarray(pt.rayleigh_ritz(A, v0=v0, deg=n, orth=-1)))
	assert np.allclose(rw_ours, rw_ref, atol=1e-8)
	assert np.allclose(rw_ours, ew, atol=1e-8)


def _load_reference_module(name: str):
	"""Import a standalone reference source file (fttr/tqli are plain numpy)."""
	import importlib.util

	path = Path(f"/root/reference/src/primate/{name}.py")
	spec = importlib.util.spec_from_file_location(f"_ref_{name}", path)
	mod = importlib.util.module_from_spec(spec)
	spec.loader.exec_module(mod)
	return mod


def test_fttr_weights_match_reference():
	"""Our vmapped forward-recurrence weights ≡ the reference Pythran source."""
	ref = _load_reference_module("fttr")
	rng = np.random.default_rng(0)
	n = 24
	ew = np.sort(rng.uniform(0.2, 2.0, 64))
	A = np.asarray(pt.symmetric(64, ew=ew, seed=3), dtype=np.float64)
	a, b = pt.lanczos(A, deg=n, orth=-1, seed=4)
	a = np.asarray(a, np.float64)
	# reference convention: beta has an unused leading element
	b_ref = np.concatenate([[0.0], np.asarray(b, np.float64)])
	theta = np.sort(np.asarray(pt.eigvalsh_tridiag(a, b)))
	w_ref = np.zeros(n)
	ref.fttr(theta, a, b_ref, n, w_ref)
	w_ours = np.asarray(pt.fttr.fttr_weights(theta, a, b_ref, k=n))
	assert np.allclose(w_ours, w_ref, atol=1e-10)


def test_fttr_truncated_diverges_from_reference_consistently():
	"""Documented divergence at k < len(alpha): the reference normalizes the k
	retained nodes by polynomial mass at the FULL stored degree n = len(alpha)
	(`fttr.py:22,27`), which is inconsistent with the degree-k rule the nodes
	define. Ours truncates the Jacobi coefficients to k — matching the GW
	weights of the leading k×k Jacobi matrix, while the reference does not."""
	ref = _load_reference_module("fttr")
	rng = np.random.default_rng(5)
	ew = np.sort(rng.uniform(0.2, 2.0, 64))
	A = np.asarray(pt.symmetric(64, ew=ew, seed=7), dtype=np.float64)
	a, b = pt.lanczos(A, deg=12, orth=-1, seed=8)
	a = np.asarray(a, np.float64)
	b_ref = np.concatenate([[0.0], np.asarray(b, np.float64)])
	k = 5
	# nodes of the degree-k rule = eigenvalues of the leading k×k Jacobi matrix
	Tk = np.diag(a[:k]) + np.diag(b_ref[1:k], 1) + np.diag(b_ref[1:k], -1)
	theta_k, Yk = np.linalg.eigh(Tk)
	w_ref = np.zeros(k)
	ref.fttr(theta_k, a, b_ref, k, w_ref)
	w_ours = np.asarray(pt.fttr.fttr(jnp.asarray(theta_k), jnp.asarray(a), jnp.asarray(b_ref), k))
	w_gw = Yk[0] ** 2  # ground truth for the degree-k Gauss rule
	assert np.allclose(np.sort(w_ours), np.sort(w_gw), atol=1e-10)  # ours = consistent rule
	assert not np.allclose(np.sort(w_ref), np.sort(w_gw), atol=1e-6)  # reference diverges


def test_tqli_eigenvalues_match_reference():
	"""Batched Givens QL ≡ the reference Pythran tqli on the same tridiagonal."""
	ref = _load_reference_module("tqli")
	rng = np.random.default_rng(1)
	n = 30
	d = rng.uniform(1.0, 3.0, n)
	e = rng.uniform(0.1, 0.5, n - 1)
	d_ref = d.copy()
	e_ref = np.concatenate([[0.0], e])  # reference wants a leading structural zero
	ref.tqli(d_ref, e_ref, np.zeros((0, 0)), 30)
	rw_ours = np.sort(np.asarray(pt.tridiag.tqli(d, e)))
	assert np.allclose(rw_ours, np.sort(d_ref), atol=1e-12)
	# and both agree with LAPACK
	import scipy.linalg as sla

	assert np.allclose(np.sort(d_ref), sla.eigvalsh_tridiagonal(d, e), atol=1e-10)
