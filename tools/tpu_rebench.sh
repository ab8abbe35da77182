#!/bin/bash
# Full TPU measurement battery (run after kernel/model changes).
# Each step is independently time-boxed; partial results are still
# written by each tool. Logs to results/tpu_rebench.log.
set -x
cd "$(dirname "$0")/.."
{
  echo "=== verify flow ==="
  timeout 600 python tools/verify_flow.py || echo "VERIFY FAILED"
  echo "=== per-family epoch bench ==="
  timeout 1800 python tools/bench_models.py --n 400 || echo "bench_models FAILED"
  echo "=== full-row 2-layer bench ==="
  timeout 2400 python tools/bench_full2.py || echo "bench_full2 FAILED"
  echo "=== kernel probe ==="
  timeout 1800 python tools/kernel_probe.py || echo "kernel_probe FAILED"
  echo "=== driver bench ==="
  timeout 2400 python bench.py || echo "bench.py FAILED"
} 2>&1 | grep -v "^WARNING" | tee results/tpu_rebench.log
