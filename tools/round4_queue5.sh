#!/bin/bash
# After queue4: tmgcn2 cls init-seed brackets (bimodal class-0 basin).
set -u
cd /root/repo
while kill -0 16869 2>/dev/null; do sleep 120; done
tunnel_wait() {
  while ! timeout 45 python -c "import jax, jax.numpy as jnp; float(jnp.ones(2).sum())" >/dev/null 2>&1; do sleep 120; done
}
for s in 1 2; do
  tunnel_wait
  timeout 2400 python tools/protocol_chess.py ours --family tmgcn2 --task cls --seed "$s" \
    >> results/protocol_chess/logs/tpu_tmgcn2_seeds.log 2>&1
  echo "[$(date -u +%H:%M:%S)] tmgcn2 s$s rc=$?"
done
