"""Smoke-run the shipped examples (slow): they are the framework's end-to-end
workflows — a regression here is a broken user journey, not a unit bug."""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
EXAMPLES = REPO / "examples"


def _run(name: str, timeout: int = 900, env_extra: dict | None = None) -> str:
	import os

	env = dict(os.environ, JAX_PLATFORMS="cpu", **(env_extra or {}))
	r = subprocess.run(
		[sys.executable, str(EXAMPLES / name)],
		capture_output=True,
		text=True,
		timeout=timeout,
		cwd=str(REPO),
		env=env,
	)
	assert r.returncode == 0, f"{name} failed:\n{r.stderr[-2000:]}"
	return r.stdout


@pytest.mark.slow
def test_gp_log_likelihood_example():
	out = _run("gp_log_likelihood.py")
	assert "final stochastic nll" in out


@pytest.mark.slow
def test_distributed_gp_example():
	out = _run(
		"distributed_gp.py",
		env_extra={"XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
	)
	assert "fitted s" in out
