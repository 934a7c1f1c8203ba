#!/bin/bash
# One-shot TPU measurement session: run every table that needs the chip,
# appending JSON lines to benchmarks/tpu_session_<date>.log. Fire this as
# soon as the tunnel probe succeeds; each stage is independently timeout-
# guarded so a mid-session tunnel death still leaves the earlier tables.
set -u
cd "$(dirname "$0")/.."
STAMP=$(date -u +%Y%m%dT%H%M%S)
LOG="benchmarks/tpu_session_${STAMP}.log"
echo "# TPU session $STAMP" | tee "$LOG"

probe() {
	timeout 120 python -c "import jax; assert any(d.platform=='tpu' for d in jax.devices())" 2>/dev/null
}

if ! probe; then
	echo '{"error": "tpu unreachable at session start"}' | tee -a "$LOG"
	exit 1
fi

echo "## bench.py (flagship config-2)" | tee -a "$LOG"
# The stage timeout must exceed bench.py's own worst-case orchestration
# budget (probe schedule + two 900s children + re-probe + CPU fallback), or
# a mid-measurement tunnel death yields NO json at all — worse than a
# labeled fallback line. Children are tightened via BENCH_CHILD_TIMEOUT_S.
timeout 4500 env BENCH_CHILD_TIMEOUT_S=900 python bench.py 2>/dev/null | tee -a "$LOG"

echo "## head_to_head (shared estimators vs real reference)" | tee -a "$LOG"
timeout 2400 python -m benchmarks.head_to_head 2>/dev/null | tee -a "$LOG"

echo "## realism (config-3 matrix classes)" | tee -a "$LOG"
timeout 2400 python -m benchmarks.realism 2>/dev/null | tee -a "$LOG"

echo "## sketch-estimator walls (config-3 block matrix; RTT-floor target)" | tee -a "$LOG"
timeout 1200 python - <<'EOF' 2>/dev/null | tee -a "$LOG"
import json, time
import numpy as np
import jax.numpy as jnp
from benchmarks.head_to_head import _spd_sparse
import primate_tpu as pt
from primate_tpu.operators import CSROperator

As = _spd_sparse()
op = CSROperator.from_scipy(As, dtype=jnp.float32)

def best(fn, reps=9):
	fn()
	ts = []
	for _ in range(reps):
		t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
	return float(np.min(ts))

walls = {
	"hutchpp_m96": best(lambda: float(pt.hutchpp(op, m=96, seed=1))),
	"xtrace_b32_c128": best(lambda: float(pt.xtrace(op, batch=32, converge="count", count=128, seed=2))),
	"xnystrace_m128": best(lambda: float(pt.xnystrace(op, m=128, seed=3))),
	"xdiag_m128": best(lambda: float(np.sum(pt.xdiag(op, m=128, seed=4)))),
}
print(json.dumps({"measure": "sketch_walls_s", **{k: round(v, 4) for k, v in walls.items()}}))
EOF

echo "done -> $LOG"
