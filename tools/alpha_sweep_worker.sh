#!/bin/bash
# Ref-side chess LP alpha-sweep worker: runs legs sequentially.
# Usage: alpha_sweep_worker.sh <alpha> [<alpha> ...]
set -u
cd /root/repo
for a in "$@"; do
  w=$(python -c "print(round($a*100))")
  out="results/protocol_chess/ref_tmgcn1_lp_a${w}.json"
  if [ -f "$out" ]; then echo "skip $a (exists)"; continue; fi
  echo "[$(date -u +%H:%M:%S)] alpha=$a start"
  OMP_NUM_THREADS=2 MKL_NUM_THREADS=2 timeout 10800 \
    python tools/protocol_chess.py ref --family tmgcn1 --task lp --alpha "$a" \
    >> "results/protocol_chess/logs/sweep_ref_a${w}.log" 2>&1
  echo "[$(date -u +%H:%M:%S)] alpha=$a rc=$?"
done
echo "worker done"
