"""Cross-product smoke matrix: every operator kind × every estimator entry point.

Guards against protocol drift — any operator the library constructs must flow
through any estimator without shape/dtype/dispatch surprises.
"""

import numpy as np
import pytest
import scipy.sparse as sps
import jax.numpy as jnp

import primate_tpu as pt
from primate_tpu.operators import AffineOperator, DenseOperator, FunctionOperator
from primate_tpu.operators.sparse import BSROperator, COOOperator, CSROperator, DIAOperator, GramOperator
from primate_tpu.solvers import solve

pytestmark = pytest.mark.slow  # integration sweeps; CI runs these in the dedicated slow job

N = 48


def _banded():
	return sps.diags([-np.ones(N - 1), 3.0 * np.ones(N), -np.ones(N - 1)], [-1, 0, 1]).tocsr()


def _operators():
	L = _banded()
	dense = jnp.asarray(L.toarray())
	X = np.random.default_rng(0).normal(size=(N + 8, N)) / np.sqrt(N)
	ops = {
		"ndarray": dense,
		"dense_op": DenseOperator(dense),
		"function": FunctionOperator(lambda V: dense @ V, (N, N), dtype=dense.dtype),
		"affine": AffineOperator(dense, t=0.0),
		"coo": COOOperator.from_scipy(L),
		"csr": CSROperator.from_scipy(L),
		"bsr": BSROperator.from_scipy(L, blocksize=(8, 8)),
		"dia": DIAOperator.from_scipy(L),
		"matrix_function": pt.MatrixFunction(dense, fun="identity", deg=N, orth=-1),
	}
	return ops


TRACE_TRUE = 3.0 * N


@pytest.mark.parametrize("name", list(_operators().keys()))
def test_every_estimator_on_every_operator(name):
	op = _operators()[name]
	assert abs(pt.hutch(op, seed=1, converge="count", count=384) - TRACE_TRUE) < 12
	assert abs(pt.hutchpp(op, m=15, seed=2) - TRACE_TRUE) < 10
	assert abs(pt.xtrace(op, batch=16, seed=3) - TRACE_TRUE) < 1.0  # exact at m=n
	d = np.asarray(pt.diag(op, seed=4, converge="count", count=384))
	assert np.abs(d - 3.0).mean() < 0.7
	xd = np.asarray(pt.xdiag(op, m=32, seed=5))
	assert abs(xd.sum() - TRACE_TRUE) / TRACE_TRUE < 0.25
	a, b = pt.lanczos(op, deg=16, orth=4, seed=6)
	assert np.all(np.isfinite(np.asarray(a)))
	y = np.random.default_rng(7).normal(size=N)
	x = np.asarray(solve(op, y, rtol=1e-8))
	assert np.allclose(np.asarray(_banded() @ x), y, atol=1e-4)


def test_gram_operator_spectral_sums():
	X = np.random.default_rng(8).normal(size=(N + 8, N)) / np.sqrt(N)
	G = GramOperator(jnp.asarray(X))
	tr_true = float(np.trace(X.T @ X))
	assert abs(pt.hutch(G, seed=9, converge="count", count=512) - tr_true) < 0.2 * tr_true
	assert abs(pt.xtrace(G, batch=16, seed=10) - tr_true) < 1e-2 * max(tr_true, 1)


def test_xdiag_odd_budget():
	A = _operators()["ndarray"]
	xd = np.asarray(pt.xdiag(A, m=33, seed=11))  # odd budget
	assert xd.shape == (N,) and np.all(np.isfinite(xd))
