#!/bin/bash
# Waits for the chess LP ref sweep workers, then runs the bitcoin_otc
# 21-alpha x 10k-epoch cls cross-run (both frameworks, one process).
set -u
cd /root/repo
for pid in 13644 13645; do
  while kill -0 "$pid" 2>/dev/null; do sleep 60; done
done
echo "[$(date -u +%H:%M:%S)] sweep workers done; starting bitcoin_otc 21-alpha cls cross-run"
AL=$(python -c "print(','.join(f'{0.75+0.01*i:.2f}' for i in range(21)))")
env PYTHONPATH= JAX_PLATFORMS=cpu OMP_NUM_THREADS=3 MKL_NUM_THREADS=3 timeout 28800 \
  python tools/cross_run_reference.py bitcoin_otc --epochs 10000 --alphas "$AL" \
  >> results/logs/cross_run_otc_sweep.log 2>&1
echo "[$(date -u +%H:%M:%S)] bitcoin_otc sweep rc=$?"
