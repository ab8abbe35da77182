#!/bin/bash
# Round-5 directive-4 queue 3: reference TM-GCN-2 chess cls repeat 2.
set -u
cd /root/repo
E="env PYTHONPATH= JAX_PLATFORMS=cpu OMP_NUM_THREADS=2 MKL_NUM_THREADS=2"
echo "[$(date -u +%H:%M:%S)] ref tmgcn2 cls rep=2 start"
$E timeout 14400 nice -n 10 python tools/protocol_chess.py ref --family tmgcn2 --task cls --rep 2 \
  >> results/protocol_chess/logs/ref_tmgcn2_cls_r2.log 2>&1
echo "[$(date -u +%H:%M:%S)] ref tmgcn2 cls rep=2 rc=$?"
echo "queue3 done"
