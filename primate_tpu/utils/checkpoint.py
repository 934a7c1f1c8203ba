"""Checkpoint / resume for long-running estimations (SURVEY §5.4).

The reference has no persistence; its estimators are merely *incremental*
(`stats.py:7-88`) and users were told to persist state in per-batch callbacks
(`docs/src/basic/quickstart.qmd:154-164`). Here the estimator state is a small
pytree — (iteration counter, rng key, Welford moments) — so checkpointing is a
flat archive write, and multi-host runs snapshot identical replicated state on
host 0 only.

``save_pytree``/``load_pytree`` round-trip any pytree of arrays through a
single ``.npz`` (structure pickled alongside the leaves).
``EstimatorCheckpoint`` is the convenience wrapper used by adaptive loops:
it snapshots (key, iteration, state) every ``every`` calls.
"""

import io
import pickle
from pathlib import Path
from typing import Any, Optional, Union

import numpy as np
import jax

__all__ = ["save_pytree", "load_pytree", "EstimatorCheckpoint"]


def _norm_path(path: Union[str, Path]) -> Path:
	"""np.savez always appends .npz — normalize so save and load agree."""
	path = Path(path)
	return path if path.suffix == ".npz" else path.with_suffix(path.suffix + ".npz")


def save_pytree(path: Union[str, Path], tree: Any) -> None:
	"""Serialize a pytree of arrays to ``path`` (single .npz archive)."""
	leaves, treedef = jax.tree_util.tree_flatten(tree)
	buf = io.BytesIO()
	pickle.dump(treedef, buf)
	arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
	np.savez(_norm_path(path), __treedef__=np.frombuffer(buf.getvalue(), dtype=np.uint8), **arrays)


def load_pytree(path: Union[str, Path]) -> Any:
	"""Load a pytree saved by :func:`save_pytree` (leaves come back as numpy).

	SECURITY: the embedded treedef is reconstructed with ``pickle`` — loading
	a checkpoint can execute arbitrary code, exactly like ``torch.load`` /
	``numpy`` pickled archives. Only load checkpoints you wrote yourself or
	obtained from a trusted source (``allow_pickle=False`` protects the array
	leaves only).
	"""
	with np.load(_norm_path(path), allow_pickle=False) as data:
		treedef = pickle.loads(data["__treedef__"].tobytes())
		leaves = [data[f"leaf_{i}"] for i in range(len(data.files) - 1)]
	return jax.tree_util.tree_unflatten(treedef, leaves)


class EstimatorCheckpoint:
	"""Periodic snapshots of an adaptive estimation loop.

	Usage with the host-stepped estimator paths (``callback=ckpt``)::

	    ckpt = EstimatorCheckpoint("run.npz", every=10)
	    hutch(A, callback=ckpt, ...)
	    ...
	    state = ckpt.load()          # {'nit': ..., 'estimate': ..., ...}

	For fully fused device loops, snapshot the final carry instead — the loop
	state is already a pytree.
	"""

	def __init__(self, path: Union[str, Path], every: int = 1):
		self.path = Path(path)
		self.every = int(every)
		self._calls = 0

	def __call__(self, result) -> None:
		self._calls += 1
		if self._calls % self.every:
			return
		payload = {
			"nit": np.asarray(getattr(result, "nit", self._calls)),
			"estimate": np.asarray(getattr(result, "estimate", np.nan)),
		}
		est = getattr(result, "estimator", None)
		if est is not None and hasattr(est, "snapshot"):
			snap = est.snapshot()
			payload["state"] = {
				"n": np.asarray(snap.n),
				"mean": np.asarray(snap.estimate),
				"var": np.asarray(snap.var) if snap.var is not None else np.asarray(np.nan),
			}
		save_pytree(self.path, payload)

	def load(self) -> Optional[dict]:
		return load_pytree(self.path) if _norm_path(self.path).exists() else None
