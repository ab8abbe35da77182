#!/bin/bash
set -u
cd /root/repo
while kill -0 16934 2>/dev/null; do sleep 120; done
tunnel_wait() {
  while ! timeout 45 python -c "import jax, jax.numpy as jnp; float(jnp.ones(2).sum())" >/dev/null 2>&1; do sleep 120; done
}
tunnel_wait
echo "[$(date -u +%H:%M:%S)] scale bench (200k nodes)"
timeout 3000 python tools/bench_scale.py --nodes 200000 --slices 64 --nnz-per-slice 1000000 --edges 500000 \
  --out results/scale_bench_200k.json >> results/logs/scale_bench.log 2>&1
echo "[$(date -u +%H:%M:%S)] rc=$?"
tunnel_wait
echo "[$(date -u +%H:%M:%S)] scale bench (500k nodes)"
timeout 4800 python tools/bench_scale.py --nodes 500000 --slices 64 --nnz-per-slice 2000000 --edges 1000000 \
  --out results/scale_bench_500k.json >> results/logs/scale_bench.log 2>&1
echo "[$(date -u +%H:%M:%S)] rc=$?"
