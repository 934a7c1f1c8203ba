"""Examples must keep running (scaled-down smoke executions)."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # integration sweeps; CI runs these in the dedicated slow job

REPO = Path(__file__).resolve().parent.parent


def _run(code: str) -> None:
	env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": str(REPO)}
	r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=300, env=env, cwd=REPO)
	assert r.returncode == 0, r.stderr[-1500:]
	assert "nan" not in r.stdout.lower(), r.stdout


def test_gp_example_one_step():
	_run(
		"""
import numpy as np
import pytest, jax, jax.numpy as jnp
import primate_tpu as pt
from examples.gp_log_likelihood import make_kernel, neg_log_likelihood
n, d = 64, 2
rng = np.random.default_rng(0)
X = jnp.asarray(rng.uniform(-2, 2, (n, d)), jnp.float32)
y = jnp.asarray(np.sin(np.asarray(X).sum(axis=1)), jnp.float32)
nll, g = jax.value_and_grad(neg_log_likelihood)(jnp.zeros(2), X, y, jax.random.PRNGKey(0), deg=12, nv=8)
assert np.isfinite(float(nll)) and np.all(np.isfinite(np.asarray(g)))
print("ok", float(nll))
"""
	)


def test_graph_example_components():
	_run(
		"""
import numpy as np
from examples.graph_analysis import build_graph_laplacian
import primate_tpu as pt
from primate_tpu.operators.sparse import CSROperator
L = build_graph_laplacian(n=300, k=4, seed=0)
op = CSROperator.from_scipy(L)
e = pt.recipes.estrada_index(op, t=-0.5, deg=12, converge="count", count=32, seed=1)
ts, phi = pt.spectral_density(op, deg=24, nv=4, seed=2)
assert np.isfinite(e) and np.all(np.isfinite(phi))
print("ok", e)
"""
	)


def test_rectangular_spectra_example():
	_run(
		"""
import numpy as np, jax.numpy as jnp
import primate_tpu as pt
from examples.rectangular_spectra import StreamedData
rng = np.random.default_rng(0)
m, n, r = 200, 60, 5
L = rng.standard_normal((m, r)).astype(np.float32) / np.sqrt(m)
R = (rng.standard_normal((n, r)) * np.geomspace(10., 2., r)).astype(np.float32)
G = rng.standard_normal((m, n)).astype(np.float32) / np.sqrt(m)
X = StreamedData(L, R, G, 0.05)
s_true = np.linalg.svd(L @ R.T + 0.05 * G, compute_uv=False)
sp = pt.recipes.schatten(X, p=np.array([1.0, 2.0]), gram=True, deg=20, orth=8, converge="count", count=128, seed=1)
assert np.allclose(sp, [np.sum(s_true), np.linalg.norm(s_true)], rtol=0.15)
U, s, Vh = pt.svds(X, k=3, seed=2)
assert np.allclose(np.sort(s)[::-1], s_true[:3], rtol=1e-3)
print("ok", sp)
"""
	)


def test_tight_binding_example_components():
	_run(
		"""
import numpy as np
from examples.tight_binding import hofstadter_hamiltonian
import primate_tpu as pt
from primate_tpu.operators.sparse import CSROperator

H = hofstadter_hamiltonian(12, 12, alpha=0.2)
op = CSROperator.from_scipy(H)
assert np.dtype(op.dtype).kind == "c"  # complex64 under default-x32, complex128 under x64
ts, dos = pt.kpm_density(op, m=64, nv=8, pdf="phase", seed=0)
tr = pt.hutch(op, pdf="phase", converge="count", count=128, seed=1)
assert np.all(np.isfinite(dos)) and abs(float(tr)) < 30.0  # tr H = 0 exactly
z = pt.recipes.heat_kernel_trace(op, t=np.array([0.5, 1.0]), deg=24, seed=2, converge="count", count=16)
assert np.all(np.isfinite(np.asarray(z)))
print("ok", float(tr))
"""
	)


def test_spectrum_slicing_example_components():
	"""The count-then-slice pipeline of examples/spectrum_slicing.py (small)."""
	import numpy as np

	import primate_tpu as pt
	from examples.spectrum_slicing import grid_laplacian
	from primate_tpu.operators.prepare import gershgorin_interval
	from primate_tpu.operators.sparse import DIAOperator

	nx, ny = 16, 10
	A = grid_laplacian(nx, ny)
	op = DIAOperator.from_scipy(A)
	jx, jy = np.arange(1, nx + 1), np.arange(1, ny + 1)
	lam = (4 * np.sin(jx * np.pi / (2 * (nx + 1))) ** 2)[:, None] + (
		4 * np.sin(jy * np.pi / (2 * (ny + 1))) ** 2
	)[None, :]
	lam = np.sort(lam.ravel())
	lo, hi = gershgorin_interval(op)
	assert lo <= lam[0] and hi >= lam[-1]
	window = (3.0, 3.5)
	true_inside = lam[(lam >= window[0]) & (lam <= window[1])]
	w, V = pt.filtered_eigsh(op, window, k=len(true_inside), spectral_interval=(lo, hi), seed=1)
	assert len(w) == len(true_inside)
	assert np.abs(np.sort(w) - true_inside).max() < 1e-6
