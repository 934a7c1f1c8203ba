#!/bin/bash
# Tunnel watcher: probe the TPU every ~90 s; on FIRST recovery, fire the
# measurement suite once (benchmarks/run_tpu_suite.sh) in the background.
# The TPU is attached over a network tunnel that can be down for hours; a
# probe must run in a killable child because backend init blocks
# uninterruptibly when the tunnel is dead. Pin to a spare core (taskset)
# so probe compiles don't pollute benchmark measurements on other cores.
#
# Usage:  nohup taskset -c 3 benchmarks/tpu_watch.sh >/dev/null 2>&1 &
#         tail -f /tmp/tpu_watch.log
FIRED=0
cd "$(dirname "$0")/.."
while true; do
  if timeout 120 python -c "import jax; assert any(d.platform=='tpu' for d in jax.devices())" >/dev/null 2>&1; then
    echo "$(date -u +%H:%M:%S) TPU_UP" >> /tmp/tpu_watch.log
    if [ "$FIRED" = 0 ]; then
      FIRED=1
      echo "$(date -u +%H:%M:%S) launching run_tpu_suite" >> /tmp/tpu_watch.log
      (bash benchmarks/run_tpu_suite.sh > /tmp/tpu_suite_run.log 2>&1; echo "$(date -u +%H:%M:%S) suite done rc=$?" >> /tmp/tpu_watch.log) &
    fi
  else
    echo "$(date -u +%H:%M:%S) down" >> /tmp/tpu_watch.log
  fi
  sleep 90
done
