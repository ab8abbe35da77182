#!/bin/bash
# Waits for queue1 (evolvegcn reps + amlsim), then runs the full preset sweep.
set -u
cd /root/repo
while kill -0 14075 2>/dev/null; do sleep 60; done
echo "[$(date -u +%H:%M:%S)] queue1 done; starting preset sweep"
env PYTHONPATH= JAX_PLATFORMS=cpu OMP_NUM_THREADS=2 timeout 14400 \
  python tools/preset_sweep.py >> results/logs/preset_sweep_r4.log 2>&1
echo "[$(date -u +%H:%M:%S)] preset sweep rc=$?"
