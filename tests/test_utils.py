"""Plotting, checkpointing, and profiling subsystem tests."""

import numpy as np
import matplotlib

matplotlib.use("Agg")

import primate_tpu as pt
from primate_tpu.plotting import figure_csm, figure_error, figure_jacobi, figure_sequence
from primate_tpu.utils.checkpoint import EstimatorCheckpoint, load_pytree, save_pytree
from primate_tpu.utils.profiling import CountingOperator, annotate, benchmark_matvec, kernel_stats


def test_save_load_pytree_roundtrip(tmp_path):
	tree = {"a": np.arange(5.0), "b": (np.ones((2, 3)), np.int32(7))}
	p = tmp_path / "state.npz"
	save_pytree(p, tree)
	back = load_pytree(p)
	assert np.allclose(back["a"], tree["a"])
	assert np.allclose(back["b"][0], tree["b"][0])
	assert int(back["b"][1]) == 7


def test_estimator_checkpoint_via_callback(tmp_path):
	A = pt.symmetric(32, pd=True, seed=0)
	ckpt = EstimatorCheckpoint(tmp_path / "run.npz", every=2)
	est = pt.hutch(A, callback=ckpt, converge="count", count=64, batch=8, seed=1)
	state = ckpt.load()
	assert state is not None
	assert int(state["nit"]) > 0
	assert np.isfinite(state["estimate"])
	assert np.isfinite(est)


def test_counting_operator():
	A = pt.symmetric(16, seed=1)
	op = CountingOperator(A)
	V = np.random.default_rng(0).normal(size=(16, 4))
	out = op.matmat(V)
	assert out.shape == (16, 4)
	assert op.n_matvecs == 4
	assert op.matvec_time > 0
	with annotate("test-region"):
		op.matvec(V[:, 0])
	assert op.n_matvecs == 5


def test_kernel_stats_and_benchmark():
	import scipy.sparse as sps
	from primate_tpu.operators.sparse import DIAOperator

	n = 512
	L = sps.diags([-np.ones(n - 1), 3 * np.ones(n), -np.ones(n - 1)], [-1, 0, 1])
	op = DIAOperator.from_scipy(L)
	stats = kernel_stats(op)
	assert stats["nnz"] == 3 * n
	res = benchmark_matvec(op, k=8, iters=4, warmup=1)
	assert res["sec_per_matmat"] > 0 and res["nnz_per_s"] > 0


def test_figures_render():
	ew = np.sort(np.random.default_rng(0).uniform(0, 1, 30))
	ax = figure_csm(ew)
	assert ax.get_title() == "Cumulative spectral density"
	ax = figure_jacobi(deg=4)
	assert "Jacobi" in ax.get_title()

	from primate_tpu.plotting import figure_orth_poly

	B = pt.symmetric(16, pd=True, seed=5)
	a, b = pt.lanczos(B, deg=16, orth=16, seed=6)
	ax = figure_orth_poly(np.asarray(a), np.concatenate([[0.0], np.asarray(b)]), k=4)
	assert len(ax.get_lines()) == 4

	A = pt.symmetric(32, pd=True, seed=2)
	est, result = pt.hutch(A, full=True, record=True, converge="count", count=64, seed=3)
	ax = figure_sequence(result.estimator, mu=float(np.trace(np.asarray(A))))
	assert ax.get_xlabel() == "Sample index"
	ax = figure_error(result.estimator, mu=float(np.trace(np.asarray(A))), threshold=0.5)
	assert "error" in ax.get_ylabel().lower()
	ax = figure_error(result.estimator)  # CI-bound branch
	assert "CI bound" in ax.get_ylabel()
