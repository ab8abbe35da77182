#!/bin/bash
# After the TPU queue: validate the driver bench (new device-loop SpMM
# timing + canonical baselines) and refresh the full-row bench.
set -u
cd /root/repo
while kill -0 16862 2>/dev/null; do sleep 120; done
tunnel_wait() {
  while ! timeout 45 python -c "import jax, jax.numpy as jnp; float(jnp.ones(2).sum())" >/dev/null 2>&1; do sleep 120; done
}
tunnel_wait
echo "[$(date -u +%H:%M:%S)] driver bench"
timeout 2400 python bench.py > results/logs/bench_r4_validate.json 2> results/logs/bench_r4_validate.log
echo "[$(date -u +%H:%M:%S)] bench rc=$?"
tunnel_wait
echo "[$(date -u +%H:%M:%S)] full2 bench"
timeout 3000 python tools/bench_full2.py >> results/logs/full2_r4.log 2>&1
echo "[$(date -u +%H:%M:%S)] full2 rc=$?"
