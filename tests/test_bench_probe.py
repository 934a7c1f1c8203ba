"""Outage-simulation tests for bench.py's TPU probe/orchestration policy.

Round 3's official capture fell back to CPU because one 180 s probe gave up
during a transient tunnel outage (VERDICT r3 weak #1). These tests drive the
retry-with-backoff loop through simulated outages via ``BENCH_PROBE_CMD``
(no jax, no TPU, subsecond).
"""

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load_bench():
	spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
	mod = importlib.util.module_from_spec(spec)
	spec.loader.exec_module(mod)
	return mod


FAST = ((5, 0.01), (5, 0.01), (5, 0.01), (5, 0))  # tiny timeouts/sleeps


def test_probe_recovers_mid_outage(tmp_path, monkeypatch):
	"""Probe fails twice (tunnel down), then the tunnel 'returns' — the retry
	loop must pick it up instead of falling back to CPU."""
	bench = _load_bench()
	counter = tmp_path / "count"
	counter.write_text("0")
	# Each probe attempt increments the counter; succeeds from the 3rd on.
	cmd = (
		f"p = {str(counter)!r}\n"
		"n = int(open(p).read()) + 1\n"
		"open(p, 'w').write(str(n))\n"
		"raise SystemExit(0 if n >= 3 else 1)"
	)
	monkeypatch.setenv("BENCH_PROBE_CMD", cmd)
	ok, log = bench.probe_tpu_with_retry(schedule=FAST)
	assert ok
	assert [e["ok"] for e in log] == [False, False, True]


def test_probe_total_outage_reports_attempts(monkeypatch):
	bench = _load_bench()
	monkeypatch.setenv("BENCH_PROBE_CMD", "raise SystemExit(1)")
	ok, log = bench.probe_tpu_with_retry(schedule=FAST)
	assert not ok
	assert len(log) == len(FAST) and not any(e["ok"] for e in log)


def test_probe_hang_is_killed_not_waited(monkeypatch):
	"""A hanging tunnel (the real failure mode: plugin init blocks forever)
	must be killed at the per-attempt timeout."""
	bench = _load_bench()
	monkeypatch.setenv("BENCH_PROBE_CMD", "import time; time.sleep(60)")
	ok, log = bench.probe_tpu_with_retry(schedule=((1, 0),))
	assert not ok
	assert log[0]["took_s"] < 10


def test_probe_healthy_tunnel_answers_first_attempt(monkeypatch):
	bench = _load_bench()
	monkeypatch.setenv("BENCH_PROBE_CMD", "raise SystemExit(0)")
	ok, log = bench.probe_tpu_with_retry(schedule=FAST)
	assert ok and len(log) == 1


def test_default_schedule_budget():
	"""The full probe schedule must stay within a driver-friendly budget."""
	bench = _load_bench()
	total = sum(t + s for t, s in bench.PROBE_SCHEDULE)
	assert 300 <= total <= 900  # patient enough to ride out bursts, bounded
