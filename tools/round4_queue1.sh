#!/bin/bash
set -u
cd /root/repo
E="env PYTHONPATH= JAX_PLATFORMS=cpu OMP_NUM_THREADS=2 MKL_NUM_THREADS=2"
for r in 1 2; do
  echo "[$(date -u +%H:%M:%S)] ref evolvegcn cls rep=$r start"
  $E timeout 14400 python tools/protocol_chess.py ref --family evolvegcn --task cls --rep "$r" \
    >> results/protocol_chess/logs/ref_evolvegcn_r${r}.log 2>&1
  echo "[$(date -u +%H:%M:%S)] rep=$r rc=$?"
done
echo "[$(date -u +%H:%M:%S)] amlsim cross-run start"
$E timeout 14400 python tools/cross_run_reference.py amlsim --epochs 10000 --alphas 0.90 \
  >> results/logs/cross_run_amlsim_r4.log 2>&1
echo "[$(date -u +%H:%M:%S)] amlsim rc=$?"
echo "queue1 done"
