#!/bin/bash
set -u
cd /root/repo
L=results/protocol_chess/logs
tunnel_wait() {
  while ! timeout 45 python -c "import jax, jax.numpy as jnp; float(jnp.ones(2).sum())" >/dev/null 2>&1; do
    sleep 120
  done
}
run() { echo "[$(date -u +%H:%M:%S)] $*"; timeout 2400 "$@"; echo "[$(date -u +%H:%M:%S)] rc=$?"; }
tunnel_wait
# FIRST: on-chip correctness of the sparse-window readout backward —
# a failure here means every downstream training leg would record
# numbers from a broken backward, so it GATES the queue.
if ! timeout 2400 python tools/check_readout_tpu.py; then
  echo "readout check FAILED; aborting queue"; exit 1
fi
for fam in wdgcn evolvegcn; do
  tunnel_wait
  run python tools/protocol_chess.py ours --family $fam --task cls >> $L/tpu_ours_cls.log 2>&1
done
for fam in tmgcn1 gcn evolvegcn wdgcn; do
  tunnel_wait
  run python tools/protocol_chess.py ours --family $fam --task lp >> $L/tpu_ours_lp.log 2>&1
done
tunnel_wait
run python tools/ours_alpha_sweep.py >> $L/tpu_ours_sweep.log 2>&1
tunnel_wait
run python tools/bench_models.py >> results/logs/model_bench_r4.log 2>&1
echo "tpu queue done"
