"""Convergence / spectral-density figures (matplotlib).

Parity: reference ``src/primate/plotting.py:7-169`` (`figure_csm`,
`figure_jacobi`, `figure_sequence`, `figure_error`) — same four figures and
semantics, rendered with matplotlib (bokeh is the reference's choice, not a
library capability; the estimator-facing API is identical). Excluded from the
numeric compute path; imports lazily so headless installs never pay for it.
"""

from typing import Optional, Sequence, Union

import numpy as np

__all__ = [
	"add_confidence_band",
	"figure_csm",
	"figure_error",
	"figure_fun",
	"figure_jacobi",
	"figure_orth_poly",
	"figure_sequence",
]


def _sample_values(estimator) -> np.ndarray:
	"""Extract the recorded per-sample values from an estimator or a sequence."""
	if hasattr(estimator, "values"):
		vals = estimator.values
		assert vals is not None, (
			"Estimator does not have values attached! Did you pass 'record=True' to the estimation call?"
		)
		return np.ravel(np.asarray(vals))
	return np.asarray(estimator, dtype=float).ravel()


def figure_csm(values: np.ndarray, ax=None, **kwargs):
	"""Cumulative spectral density: step CDF of the eigenvalues + rug marks.

	Parity: reference `plotting.py:7-29`.
	"""
	import matplotlib.pyplot as plt

	values = np.sort(np.asarray(values).ravel())
	assert values.size > 0, "figure_csm requires at least one value"
	if ax is None:
		_, ax = plt.subplots(figsize=kwargs.pop("figsize", (4.5, 3.2)))
	m = 1.0 / len(values)
	csm = np.searchsorted(values, values, side="right") * m
	ax.fill_between(np.append(values, values[-1]), 0, np.append(csm, 1.0), step="post", alpha=0.15)
	ax.step(np.append(values, values[-1]), np.append(csm, 1.0), where="post", lw=1.2)
	ax.plot(values, np.zeros_like(values), "x", color="red", ms=5, label="Eigenvalues")
	ax.set_title("Cumulative spectral density")
	ax.set_xlabel("Spectrum")
	ax.set_ylabel(r"$\mathbf{1}(\lambda \leq x)$")
	ax.legend(loc="upper left", fontsize=8)
	return ax


def figure_jacobi(deg: int = 4, alpha: float = 0, beta: float = 0, ax=None):
	"""The first ``deg`` Jacobi polynomials on [-1, 1].

	Parity: reference `plotting.py:36-60`.
	"""
	import matplotlib.pyplot as plt
	import scipy.special as spc

	assert deg <= 10
	if ax is None:
		_, ax = plt.subplots(figsize=(4.5, 3.6))
	dom = np.linspace(-1, 1, 1500)
	for d in range(deg):
		ax.plot(dom, spc.eval_jacobi(d, alpha, beta, dom), lw=1.5, label=f"d={d}")
	ax.set_title(rf"Jacobi polynomials ($\alpha$={alpha:.1f}, $\beta$={beta:.1f})")
	ax.legend(loc="lower right", fontsize=8)
	return ax


def figure_orth_poly(alpha, beta, k: Optional[int] = None, domain=None, ax=None):
	"""The first ``k`` orthonormal polynomials defined by Jacobi coefficients.

	Parity: reference `plotting.py:32-33` declares ``figure_orth_poly`` but
	leaves it an empty stub; this renders the actual sequence via the FTTR
	recurrence (`fttr.ortho_poly`). ``alpha (n,)``/``beta (n,)`` follow the
	leading-slot convention of `lanczos` output with a zero prepended to beta
	(i.e. ``beta[i]`` couples p_{i-1}→p_i). Default domain spans the Gauss
	nodes of the Jacobi matrix, padded 5% each side.
	"""
	import matplotlib.pyplot as plt

	from .fttr import ortho_poly
	from .tridiag import eigvalsh_tridiag

	alpha, beta = np.asarray(alpha, float), np.asarray(beta, float)
	n = len(alpha)
	k = min(n, 6) if k is None else k
	assert k <= n, f"k={k} exceeds the {n} available Jacobi coefficients"
	if domain is None:
		nodes = np.asarray(eigvalsh_tridiag(alpha, beta[1:n]))
		lo, hi = nodes.min(), nodes.max()
		pad = 0.05 * (hi - lo + (hi == lo))
		domain = (lo - pad, hi + pad)
	if ax is None:
		_, ax = plt.subplots(figsize=(4.5, 3.6))
	dom = np.linspace(domain[0], domain[1], 1500)
	P = np.asarray(ortho_poly(dom, 1.0, alpha, beta))  # (1500, n)
	for d in range(k):
		ax.plot(dom, P[:, d], lw=1.5, label=f"d={d}")
	ax.set_title("Orthogonal polynomials (three-term recurrence)")
	ax.legend(loc="lower right", fontsize=8)
	return ax


def figure_fun(fun, bounds: tuple = (-1.0, 1.0), ax=None, **kwargs):
	"""Plot a spectral function (builtin name or callable) over ``bounds``.

	Parity: reference `plotting.py:202-211` declares ``figure_fun`` but leaves
	it commented out; this is the working version. Builtin names resolve through
	`special.param_callable` with ``**kwargs`` forwarded (e.g.
	``figure_fun("smoothstep", a=0.1, b=0.9)``).
	"""
	import matplotlib.pyplot as plt

	from .special import param_callable

	assert isinstance(fun, str) or callable(fun), "'fun' must be string or callable."
	name = fun if isinstance(fun, str) else getattr(fun, "__name__", "fun")
	f = param_callable(fun, **kwargs) if isinstance(fun, str) else fun
	dom = np.linspace(bounds[0], bounds[1], 250, endpoint=True)
	out = np.asarray(f(dom))
	if ax is None:
		_, ax = plt.subplots(figsize=(3.2, 3.2))
	ax.plot(dom, out, lw=1.5)
	ax.set_title(f"fun = {name}")
	ax.set_xlabel(r"$\lambda$")
	return ax


def _running_mean_stderr(x: np.ndarray):
	"""Cumulative mean and ddof-1 standard error of the mean, numerically
	stable: samples are CENTERED by the overall mean before the cumulative
	second moment, so the cumsum-of-squares identity operates on O(σ)
	residuals instead of O(mean) values (the raw ``cum_sq/n − mean²`` form
	loses all variance digits once |mean| ≫ σ — e.g. trace estimates ~1e8
	with unit variance came back with variance 8). Returns (avgs, std_err);
	std_err is NaN-free (0 at n = 1)."""
	idx = np.arange(1, len(x) + 1)
	n = idx.astype(float)
	avgs = np.cumsum(x) / idx
	c = x - (avgs[-1] if len(x) else 0.0)  # center by the final mean
	cum_c = np.cumsum(c)
	cum_c2 = np.cumsum(c**2)
	var = np.maximum(cum_c2 / n - (cum_c / n) ** 2, 0.0) * n / np.maximum(n - 1, 1)
	return avgs, np.sqrt(var / n)


def add_confidence_band(ax, estimator: Union[object, Sequence], confidence: float = 0.95, **kwargs):
	"""Shade the running CLT confidence band around the cumulative mean.

	Parity: reference `plotting.py:98-114` sketches ``add_confidence_band`` in
	a comment block (bokeh ``Band`` around ``sample_avgs ± quantile·std_err``);
	this is the working version, layered onto an existing axis — typically one
	produced by `figure_sequence`.
	"""
	import scipy.special as spc

	sample_vals = _sample_values(estimator)
	x = sample_vals[~np.isnan(sample_vals)]
	idx = np.arange(1, len(x) + 1)
	quantile = np.sqrt(2.0) * spc.erfinv(confidence)
	avgs, std_err = _running_mean_stderr(x)
	moe = quantile * std_err
	ax.fill_between(
		idx,
		avgs - moe,
		avgs + moe,
		alpha=kwargs.pop("alpha", 0.3),
		color=kwargs.pop("color", "yellow"),
		edgecolor=kwargs.pop("edgecolor", "black"),
		**kwargs,
	)
	return ax


def figure_sequence(estimator: Union[object, Sequence], mu: Optional[float] = None, ax=None, **kwargs):
	"""Per-sample variates + running mean, with an optional true-value line.

	Parity: reference `plotting.py:63-95`.
	"""
	import matplotlib.pyplot as plt

	sample_vals = _sample_values(estimator)
	valid = ~np.isnan(sample_vals)
	n_samples = int(np.sum(valid))
	idx = np.arange(1, n_samples + 1)
	avgs = np.cumsum(sample_vals[valid]) / idx

	if ax is None:
		_, ax = plt.subplots(figsize=kwargs.pop("figsize", (5, 3.6)))
	ax.scatter(idx, sample_vals[valid], s=8, color="gray", label="samples")
	if mu is not None:
		ax.axhline(mu, color="red", lw=1.0)
	ax.plot(idx, avgs, color="black", lw=1.5, label="estimator")
	ax.set_title("Monte Carlo sample variates")
	ax.set_xlabel("Sample index")
	ax.set_ylabel("Estimates")
	ax.legend(loc="upper left", fontsize=8)
	return ax


def figure_error(
	estimator: Union[object, Sequence],
	mu: Optional[float] = None,
	threshold: Optional[float] = None,
	absolute: bool = True,
	title: str = "Estimator accuracy",
	ax=None,
	**kwargs,
):
	"""Error of the running mean vs sample count: true error (``mu`` given) or
	the CLT confidence-interval bound (``mu`` absent).

	Parity: reference `plotting.py:117-169`.
	"""
	import matplotlib.pyplot as plt

	sample_vals = _sample_values(estimator)
	valid = ~np.isnan(sample_vals)
	idx = np.arange(1, int(np.sum(valid)) + 1)
	avgs = np.cumsum(sample_vals[valid]) / idx

	if mu is not None:
		cum_error = np.abs(mu - avgs) if absolute else np.abs((mu - avgs) / mu)
	else:
		# Vectorized CLT bound: cumulative mean/variance + t (n<30) / z scores
		# in one numpy pass (a per-sample jnp estimator update would cost a
		# device round trip per point).
		import scipy.stats as st

		x = sample_vals[valid]
		cum_mean, std_err = _running_mean_stderr(x)
		score = np.where(idx < 30, st.t.ppf(0.975, df=np.maximum(idx - 1, 1)), st.norm.ppf(0.975))
		moe = score * std_err
		with np.errstate(divide="ignore", invalid="ignore"):
			rerr = np.where(cum_mean == 0, np.inf, np.abs(std_err / cum_mean))
		cum_error = np.where(idx < 3, np.inf, moe if absolute else rerr)

	if ax is None:
		_, ax = plt.subplots(figsize=kwargs.pop("figsize", (5, 3.6)))
	ax.plot(idx, cum_error, color="black", lw=1.2)
	if threshold is not None:
		ax.axhline(threshold, color="darkgray", ls="--", lw=1.0)
	y_label = ("Abs. error" if absolute else "Rel. error") + (" (true)" if mu is not None else " (CI bound)")
	ax.set_title(title)
	ax.set_xlabel("Sample index")
	ax.set_ylabel(y_label)
	ax.set_xlim(0, len(idx))
	return ax
