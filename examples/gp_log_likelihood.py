"""Gaussian-process log-marginal likelihood with gradients, end to end.

	-2·log p(y|θ) = logdet K(θ) + yᵀ K(θ)⁻¹ y + n·log 2π

logdet comes from stochastic Lanczos quadrature (one fused device program),
the quadratic term from batched matrix-free CG, and the whole loss
differentiates with `jax.grad` for hyperparameter learning — none of which
the reference library can do (host-serial, no solver, no autodiff).

Run: python examples/gp_log_likelihood.py
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo-checkout runs

import os as _os

if _os.environ.get("JAX_PLATFORMS", "").strip() not in ("", "axon"):
	# Honor an explicit JAX_PLATFORMS=cpu despite site hooks that re-register
	# accelerator plugins and override the env var programmatically.
	import jax as _jax

	_jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"].strip())

import numpy as np
import jax
import jax.numpy as jnp

import primate_tpu as pt


def make_kernel(theta: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
	"""RBF kernel matrix + noise: θ = (log lengthscale, log noise)."""
	ell, noise = jnp.exp(theta)
	sq = jnp.sum((X[:, None, :] - X[None, :, :]) ** 2, axis=-1)
	return jnp.exp(-0.5 * sq / ell**2) + (noise + 1e-4) * jnp.eye(X.shape[0])


def neg_log_likelihood(theta, X, y, key, deg=24, nv=32):
	K = make_kernel(theta, X)
	# Differentiable SLQ logdet (autodiff.logdet, a custom_vjp): forward is the
	# fused Lanczos-quadrature estimate on nv shared Rademacher probes; backward
	# is the stochastic identity  ∂logdet(K) = tr(K⁻¹ ∂K)  via batched CG on the
	# SAME probes — reverse mode never unrolls the Lanczos recurrence (that
	# costs O(deg·n·nv) residual memory and is numerically fragile).
	logdet = pt.autodiff.logdet(K, deg=deg, orth=8, nv=nv, seed=key, solver_rtol=1e-6)
	# GP kernels have exactly the outlier-heavy spectrum the randomized Nyström
	# preconditioner was built for; gradients flow through the preconditioned
	# solve via custom_linear_solve (the preconditioner itself is treated as
	# solve machinery, not differentiated through).
	pre = pt.nystrom_precond(jax.lax.stop_gradient(K), rank=48, seed=0)
	alpha = pt.solve(K, y, rtol=1e-8, precond=pre)
	return 0.5 * (logdet + y @ alpha + X.shape[0] * jnp.log(2 * jnp.pi))


def main():
	n, d = 256, 2
	rng = np.random.default_rng(0)
	X = jnp.asarray(rng.uniform(-2, 2, (n, d)), jnp.float32)
	y = jnp.asarray(np.sin(np.asarray(X).sum(axis=1)) + 0.1 * rng.normal(size=n), jnp.float32)

	theta = jnp.zeros(2)
	key = jax.random.PRNGKey(1)
	loss_grad = jax.value_and_grad(neg_log_likelihood)

	# Standard ecosystem optimizer: the stochastic gradients drop straight
	# into optax (fresh probes per step average the estimator noise out).
	import optax

	opt = optax.adam(0.1)
	opt_state = opt.init(theta)
	for it in range(30):
		nll, g = loss_grad(theta, X, y, jax.random.fold_in(key, it))
		updates, opt_state = opt.update(g, opt_state)
		theta = optax.apply_updates(theta, updates)
		if it % 5 == 0:
			print(f"iter {it:2d}  nll={float(nll):9.3f}  theta={np.asarray(theta).round(3)}")

	Kd = np.asarray(make_kernel(theta, X), np.float64)
	exact = 0.5 * (
		np.linalg.slogdet(Kd)[1] + np.asarray(y) @ np.linalg.solve(Kd, np.asarray(y)) + n * np.log(2 * np.pi)
	)
	print(f"final stochastic nll={float(loss_grad(theta, X, y, key)[0]):.3f}  exact={exact:.3f}")


if __name__ == "__main__":
	main()
