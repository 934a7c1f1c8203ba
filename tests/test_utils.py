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

	from primate_tpu.plotting import add_confidence_band, figure_fun

	ax = figure_fun("smoothstep", a=0.1, b=0.9)
	assert "smoothstep" in ax.get_title()
	ax = figure_fun(np.exp, bounds=(0.0, 2.0))
	(line,) = ax.get_lines()
	assert np.allclose(line.get_ydata(), np.exp(line.get_xdata()))

	ax = figure_sequence(result.estimator)
	n_coll = len(ax.collections)
	ax = add_confidence_band(ax, result.estimator)
	assert len(ax.collections) == n_coll + 1  # the shaded band was added
	band = ax.collections[-1].get_paths()[0].vertices
	# Band must straddle the running mean at the final sample index.
	est_final = float(np.mean(np.ravel(np.asarray(result.estimator.values))))
	assert band[:, 1].min() <= est_final <= band[:, 1].max()


def test_arr_summary_formats():
	from primate_tpu.estimators import arr_summary

	assert arr_summary(None) == "None"
	assert arr_summary(1.5) == "1.500"
	assert arr_summary([1.0, 2.0]).startswith("[")
	long = arr_summary(np.arange(10.0))
	assert "...," in long


def test_scaled_operator():
	from primate_tpu.operators import ScaledOperator

	A = np.asarray(pt.symmetric(12, pd=True, seed=0))
	S = ScaledOperator(A, t=0.5, s=2.0)
	V = np.random.default_rng(1).normal(size=(12, 3))
	assert np.allclose(np.asarray(S.matmat(V)), 2.0 * (A @ V + 0.5 * V), atol=1e-6)


def test_mean_state_streaming_matches_numpy():
	import jax.numpy as jnp
	from primate_tpu.stats import make_mean_state, mean_update

	rng = np.random.default_rng(5)
	X = rng.normal(size=(40, 3))
	st = make_mean_state(3, jnp.float64)
	for i in range(0, 40, 8):
		st = mean_update(st, jnp.asarray(X[i : i + 8]))
		assert np.allclose(np.asarray(st.mu), X[: i + 8].mean(axis=0))
	assert int(st.n) == 40


def test_isotropic_class_fill_and_reproducibility():
	s = pt.random.Isotropic(size=(10, 4), pdf="sphere", seed=9)
	v = np.asarray(s.fill())
	assert v.shape == (10, 4) and np.allclose(np.linalg.norm(v, axis=0), np.sqrt(10))
	assert np.array_equal(np.asarray(s.values), v)
	s2 = pt.random.Isotropic(size=(10, 4), pdf="sphere", seed=9)
	assert np.array_equal(np.asarray(s2.fill()), v)


def test_fttr_weights_direct():
	from primate_tpu.fttr import fttr_weights

	rng = np.random.default_rng(2)
	n = 10
	A = pt.symmetric(n, pd=True, seed=rng)
	a, b = pt.lanczos(A, deg=n, orth=n, seed=rng)
	theta, tau = pt.quadrature(a, b, quad="gw")
	bb = np.concatenate([[0.0], np.asarray(b)])
	w = np.asarray(fttr_weights(np.asarray(theta), np.asarray(a), bb))
	# weights from the recurrence normalize against mu_0 = sum|theta|
	assert np.allclose(w / w.sum(), np.asarray(tau) / np.asarray(tau).sum(), atol=1e-8)


def test_mesh_devices_and_lanczos_block_op_cache():
	import jax
	from primate_tpu.parallel import mesh_devices
	from primate_tpu.lanczos import lanczos_block_op
	from primate_tpu.operators import DenseOperator

	assert len(mesh_devices(2)) == 2

	# same-shape operators hit the same compiled program (pytree-keyed)
	A1 = pt.symmetric(16, pd=True, seed=0)
	A2 = pt.symmetric(16, pd=True, seed=1)
	V = jax.random.normal(jax.random.PRNGKey(0), (16, 2))
	f = lanczos_block_op
	o1 = f(DenseOperator(A1), V, deg=6, ncv=2, orth=0)
	n_before = f._cache_size()
	o2 = f(DenseOperator(A2), V, deg=6, ncv=2, orth=0)
	assert f._cache_size() == n_before  # no retrace for a same-structure operator
	assert not np.allclose(np.asarray(o1.alphas), np.asarray(o2.alphas))


def test_restrict_and_setdiff_kwargs():
	"""Signature-based kwargs routing — the reference's whole "config system"
	(`typing.py:5-14`): restrict keeps only params of f, setdiff the rest."""
	from primate_tpu.utils.kwargs import restrict_kwargs, setdiff_kwargs

	def f(a, b=1, *, c=2):
		return a + b + c

	kw = {"a": 1, "b": 2, "c": 3, "d": 4, "e": 5}
	assert restrict_kwargs(f, kw) == {"a": 1, "b": 2, "c": 3}
	assert setdiff_kwargs(f, kw) == {"d": 4, "e": 5}
	assert restrict_kwargs(f, {}) == {}
	assert setdiff_kwargs(f, {}) == {}


def test_get_include_ships_native_header():
	"""`get_include()` points at the native headers (reference parity:
	`primate.get_include()`, its `__init__.py:17-38`)."""
	import os
	import primate_tpu

	inc = primate_tpu.get_include()
	assert os.path.isdir(inc)
	assert os.path.exists(os.path.join(inc, "sparse_prep.h"))


def test_default_trace_criterion_composition():
	"""hutch's default stop is count(200) | confidence(.95, atol=1.0)
	(reference `trace.py:89-92`) and is a jittable composition."""
	from primate_tpu.estimators import default_trace_criterion, is_jittable_criterion
	from primate_tpu.estimators import MeanEstimator

	crit = default_trace_criterion()
	assert is_jittable_criterion(crit)
	est = MeanEstimator(covariance=True)
	import numpy as np

	for _ in range(201):  # count bound fires regardless of variance
		est.update(np.asarray([1000.0 * np.random.default_rng(0).normal()]))
	assert bool(crit(est))


def test_plotting_running_variance_stable_at_large_mean():
	"""Review r3g: the running CI band variance must survive |mean| >> sigma
	(the raw cumsum-of-squares identity lost every variance digit at 1e8)."""
	from primate_tpu.plotting import _running_mean_stderr

	rng = np.random.default_rng(0)
	x = 1e8 + rng.normal(size=400)
	avgs, se = _running_mean_stderr(x)
	var_run = (se[-1] ** 2) * len(x)
	assert abs(var_run - np.var(x, ddof=1)) / np.var(x, ddof=1) < 0.05
	assert abs(avgs[-1] - x.mean()) < 1e-6


def test_restrict_kwargs_excludes_positional_only():
	"""Review r3g: positional-only params cannot be passed as keywords — they
	must route to 'rest', not crash fun(**taken)."""
	from primate_tpu.utils.kwargs import restrict_kwargs, setdiff_kwargs

	def f(x, /, y=1):
		return x + y

	taken = restrict_kwargs(f, {"x": 5, "y": 2})
	assert taken == {"y": 2}
	f(0, **taken)  # must not raise
	assert setdiff_kwargs(f, {"x": 5, "y": 2}) == {"x": 5}
