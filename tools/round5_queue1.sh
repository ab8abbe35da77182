#!/bin/bash
# Round-5 directive-4 queue 1: reference LP repeats (EvolveGCN, WD-GCN)
# then ours-side LP seed repeats. ~2h total at recorded walls.
set -u
cd /root/repo
E="env PYTHONPATH= JAX_PLATFORMS=cpu OMP_NUM_THREADS=2 MKL_NUM_THREADS=2"
for r in 1 2; do
  for fam in evolvegcn wdgcn; do
    echo "[$(date -u +%H:%M:%S)] ref $fam lp rep=$r start"
    $E timeout 14400 nice -n 10 python tools/protocol_chess.py ref --family $fam --task lp --rep "$r" \
      >> results/protocol_chess/logs/ref_${fam}_lp_r${r}.log 2>&1
    echo "[$(date -u +%H:%M:%S)] ref $fam lp rep=$r rc=$?"
  done
done
for s in 1 2; do
  for fam in evolvegcn wdgcn; do
    echo "[$(date -u +%H:%M:%S)] ours $fam lp seed=$s start"
    $E timeout 7200 nice -n 10 python tools/protocol_chess.py ours --family $fam --task lp --seed "$s" \
      >> results/protocol_chess/logs/ours_${fam}_lp_s${s}.log 2>&1
  echo "[$(date -u +%H:%M:%S)] ours $fam lp seed=$s rc=$?"
  done
done
echo "queue1 done"
