#!/bin/bash
# Round-4 TPU queue: post-precision-fix ours-side protocol refresh + alpha sweep.
set -u
cd /root/repo
L=results/protocol_chess/logs
run() { echo "[$(date -u +%H:%M:%S)] $*"; timeout 3600 "$@"; echo "[$(date -u +%H:%M:%S)] rc=$?"; }
for fam in tmgcn1 tmgcn2 gcn wdgcn evolvegcn; do
  run python tools/protocol_chess.py ours --family $fam --task cls >> $L/tpu_ours_cls.log 2>&1
done
for fam in tmgcn1 gcn evolvegcn wdgcn; do
  run python tools/protocol_chess.py ours --family $fam --task lp >> $L/tpu_ours_lp.log 2>&1
done
run python tools/ours_alpha_sweep.py >> $L/tpu_ours_sweep.log 2>&1
echo "tpu queue done"
