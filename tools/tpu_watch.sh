#!/bin/bash
# Detached TPU-tunnel watcher: probes the axon tunnel every 5 minutes and,
# on first recovery, runs the full measurement battery (tools/tpu_rebench.sh)
# exactly once. Logs to results/tpu_watch.log. Launch with:
#   setsid nohup bash tools/tpu_watch.sh > /dev/null 2>&1 &
cd "$(dirname "$0")/.."
LOG=results/tpu_watch.log
echo "$(date -u +%FT%TZ) watcher start (pid $$)" >> "$LOG"
while true; do
  if timeout 60 python -c "import jax, jax.numpy as jnp; print(float(jnp.ones(4).sum()))" >> "$LOG" 2>&1; then
    echo "$(date -u +%FT%TZ) tunnel UP -> running battery" >> "$LOG"
    bash tools/tpu_rebench.sh >> "$LOG" 2>&1
    echo "$(date -u +%FT%TZ) battery done" >> "$LOG"
    exit 0
  fi
  echo "$(date -u +%FT%TZ) tunnel still down" >> "$LOG"
  sleep 300
done
