#!/bin/bash
set -u
cd /root/repo
for s in 0 1 2; do
  echo "[$(date -u +%H:%M:%S)] ours evolvegcn cls seed=$s start"
  env PYTHONPATH= JAX_PLATFORMS=cpu OMP_NUM_THREADS=2 timeout 14400 \
    nice -n 10 python tools/protocol_chess.py ours --family evolvegcn --task cls --seed "$s" \
    >> results/protocol_chess/logs/ours_evolvegcn_s${s}.log 2>&1
  echo "[$(date -u +%H:%M:%S)] seed=$s rc=$?"
done
echo "repeats done"
