"""Scaling-efficiency harness: sharded SLQ over growing device counts.

BASELINE.json's north star asks for ≥80% scaling efficiency at 1 chip /
1 host / N ≥ 2 hosts. Real multi-chip hardware is not attached to this
environment, so this harness measures the SAME fused sharded program the pod
would run on **emulated meshes** (clearly labeled as such):

  * single-process, ``--xla_force_host_platform_device_count=N`` virtual CPU
    devices for N ∈ {1, 2, 4, 8} — validates the shard_map/collective
    structure and measures the collective+partition overhead the program adds
    as the mesh grows;
  * 2 OS processes joined via ``jax.distributed.initialize`` (the DCN path on
    a real pod) with 2 virtual devices each — the cross-process collective
    overhead measurement.

CAVEAT (printed with every table): all virtual devices share one host's CPU
cores, so wall times do NOT show real-hardware speedups — weak-scaling walls
grow ~linearly with total work and strong-scaling walls cannot drop. The
meaningful emulated metric is **overhead efficiency**: single-device wall for
the same TOTAL work divided by the sharded wall (1.0 = the sharded program
adds no partition/collective cost beyond the compute itself). On a real pod,
per-device compute time divides by N while the collective structure measured
here is unchanged (ICI inside a slice, DCN across hosts).

Run: ``python -m benchmarks.scaling`` (writes a table + JSON lines to stdout).
Each (mode, ndev) cell runs in a fresh subprocess so the forced device count
is set before jax initializes.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

ROWS_PER_DEV = 65_536  # weak scaling: constant rows per device
STRONG_ROWS = 262_144  # strong scaling: fixed total problem
DEG = 16
PROBES = 32

_CHILD = r"""
import json, os, sys, time
ndev = int(sys.argv[1])
n_rows = int(sys.argv[2])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={ndev}"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, scipy.sparse as sps, jax.numpy as jnp
import primate_tpu as pt
from primate_tpu.operators.sparse import DIAOperator
from primate_tpu.parallel import make_mesh, shard_operator

DEG, PROBES = %d, %d
L = sps.diags([-np.ones(n_rows - 1), 3.0 * np.ones(n_rows), -np.ones(n_rows - 1)], [-1, 0, 1])
op = DIAOperator.from_scipy(L, dtype=jnp.float32)
if ndev > 1:
    mesh = make_mesh((ndev, 1), ("op", "probe"))
    op = shard_operator(op, mesh)
M = pt.MatrixFunction(op, fun="log", deg=DEG, orth=0, dtype=jnp.float32)
run = lambda: pt.hutch(M, batch=PROBES, converge="count", count=PROBES, seed=3)
est = float(run())  # compile + warm
k = np.arange(1, n_rows + 1)
exact = float(np.sum(np.log(3.0 - 2.0 * np.cos(k * np.pi / (n_rows + 1)))))
walls = []
for _ in range(3):
    t0 = time.perf_counter(); run(); walls.append(time.perf_counter() - t0)
print(json.dumps({"ndev": ndev, "rows": n_rows, "wall_s": round(min(walls), 4),
                  "rel_err": round(abs(est - exact) / abs(exact), 6)}))
""" % (DEG, PROBES)

_CHILD_2PROC = r"""
import json, os, sys, time
pid, port, n_rows = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid)
import numpy as np, scipy.sparse as sps, jax.numpy as jnp
import primate_tpu as pt
from primate_tpu.operators.sparse import DIAOperator
from primate_tpu.parallel import make_mesh, shard_operator

DEG, PROBES = %d, %d
L = sps.diags([-np.ones(n_rows - 1), 3.0 * np.ones(n_rows), -np.ones(n_rows - 1)], [-1, 0, 1])
mesh = make_mesh((jax.device_count(), 1), ("op", "probe"))
op = shard_operator(DIAOperator.from_scipy(L, dtype=jnp.float32), mesh)
M = pt.MatrixFunction(op, fun="log", deg=DEG, orth=0, dtype=jnp.float32)
run = lambda: pt.hutch(M, batch=PROBES, converge="count", count=PROBES, seed=3)
run()
walls = []
for _ in range(3):
    t0 = time.perf_counter(); run(); walls.append(time.perf_counter() - t0)
if pid == 0:
    print(json.dumps({"ndev": 4, "processes": 2, "rows": n_rows, "wall_s": round(min(walls), 4)}), flush=True)
""" % (DEG, PROBES)


def _run_child(ndev: int, rows: int, timeout: float = 600.0) -> dict:
	r = subprocess.run(
		[sys.executable, "-c", _CHILD, str(ndev), str(rows)],
		capture_output=True,
		text=True,
		timeout=timeout,
		cwd=str(Path(__file__).resolve().parent.parent),
	)
	assert r.returncode == 0, r.stderr[-2000:]
	return json.loads(r.stdout.strip().splitlines()[-1])


def _free_port() -> int:
	with socket.socket() as s:
		s.bind(("localhost", 0))
		return s.getsockname()[1]


def _run_two_process(rows: int, timeout: float = 600.0) -> dict:
	port = str(_free_port())
	cwd = str(Path(__file__).resolve().parent.parent)
	procs = [
		subprocess.Popen(
			[sys.executable, "-c", _CHILD_2PROC, str(i), port, str(rows)],
			stdout=subprocess.PIPE,
			stderr=subprocess.PIPE,
			text=True,
			cwd=cwd,
		)
		for i in range(2)
	]
	outs = [p.communicate(timeout=timeout) for p in procs]
	assert all(p.returncode == 0 for p in procs), outs[0][1][-1500:] + outs[1][1][-1500:]
	return json.loads(outs[0][0].strip().splitlines()[-1])


def main() -> None:
	print("# Scaling harness — EMULATED meshes (virtual CPU devices sharing one host's cores).")
	print("# 'overhead efficiency' = single-device wall for the same TOTAL work / sharded wall.")
	results = {"weak": [], "strong": []}

	# Weak scaling: rows grow with the mesh; reference = 1 device on the SAME total rows.
	for ndev in (1, 2, 4, 8):
		rows = ROWS_PER_DEV * ndev
		sharded = _run_child(ndev, rows)
		single = sharded if ndev == 1 else _run_child(1, rows)
		eff = single["wall_s"] / sharded["wall_s"]
		results["weak"].append({**sharded, "single_wall_s": single["wall_s"], "overhead_efficiency": round(eff, 3)})
		print(json.dumps({"mode": "weak", **results["weak"][-1]}), flush=True)

	# Strong scaling: fixed total rows, growing mesh; reference = the 1-device run.
	base = None
	for ndev in (1, 2, 4, 8):
		r = _run_child(ndev, STRONG_ROWS)
		base = base or r
		eff = base["wall_s"] / r["wall_s"]
		results["strong"].append({**r, "overhead_efficiency": round(eff, 3)})
		print(json.dumps({"mode": "strong", **results["strong"][-1]}), flush=True)

	# 2-process DCN-emulated path (4 global devices), strong shape.
	try:
		two = _run_two_process(STRONG_ROWS)
		eff = base["wall_s"] / two["wall_s"]
		print(json.dumps({"mode": "2-process-dcn", **two, "overhead_efficiency": round(eff, 3)}), flush=True)
	except Exception as e:  # the 2-proc path needs free ports + distributed service
		print(json.dumps({"mode": "2-process-dcn", "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
	main()
