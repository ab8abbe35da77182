"""Sharded-path feasibility past single-chip HBM (virtual 8-device mesh).

The 1M-node restricted 2-layer operator exceeds one v5e's 16GB
(results/scale_bench_1m.json). This demo executes the SHARDED 2-layer
training step at that scale on a virtual 8-device CPU mesh
(graph x time), proving the memory story the comm model predicts: each
shard holds 1/8th of the adjacency/embeddings and the step compiles and
runs end-to-end (CPU wall time is NOT a performance claim — virtual
devices share the host).

    python tools/sharded_scale_demo.py [--nodes 1000000] [--mesh 4x2]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--slices", type=int, default=64)
    ap.add_argument("--nnz-per-slice", type=int, default=3_000_000)
    ap.add_argument("--edges", type=int, default=2_000_000)
    ap.add_argument("--mesh", default="4x2")
    ap.add_argument("--band", type=int, default=20)
    ap.add_argument("--out", default="results/sharded_scale_demo.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    import jax.numpy as jnp
    import optax

    from tmgcn_tpu.models.tmgcn import TMGCN2
    from tmgcn_tpu.parallel.adapter import make_sharded_edge_adapter
    from tmgcn_tpu.parallel.mesh import make_mesh
    from tools.bench_scale import build_inputs

    g, t = (int(x) for x in args.mesh.split("x"))
    res = {
        "nodes": args.nodes, "slices": args.slices,
        "nnz_per_slice": args.nnz_per_slice, "edges": args.edges,
        "mesh": args.mesh, "devices": len(jax.devices()),
        "backend": jax.default_backend(),
    }
    t0 = time.perf_counter()
    A, M, X, edges, tgt_np, cw_np = build_inputs(
        args.nodes, args.slices, args.nnz_per_slice, args.edges, args.band
    )
    tgt = jnp.asarray(tgt_np)
    cw = jnp.asarray(cw_np)
    res["build_host_s"] = round(time.perf_counter() - t0, 1)
    print(f"# built ({res['build_host_s']}s); sharding over {args.mesh}",
          file=sys.stderr)

    mesh = make_mesh(n_graph=g, n_time=t)
    model = TMGCN2(
        n_slices=args.slices, in_feat=X.shape[-1], hidden_feat=(6, 6, 2),
        nonlin2="selu",
    )
    t0 = time.perf_counter()
    adapter = make_sharded_edge_adapter(
        model,
        {w: A for w in ("train", "val", "test")},
        {w: X for w in ("train", "val", "test")},
        {w: edges for w in ("train", "val", "test")},
        M, mesh,
    )
    res["adapter_build_s"] = round(time.perf_counter() - t0, 1)
    print(f"# sharded adapter built ({res['adapter_build_s']}s)", file=sys.stderr)

    variables = adapter.init(jax.random.PRNGKey(0))
    params, buffers = variables["params"], variables["buffers"]
    # lr 1e-6, no momentum: the unnormalized power-law graph has raw
    # degree features up to ~1e4, so gradients are huge; the claim under
    # test is EXECUTION feasibility (the sharded step compiles and runs
    # with finite losses at a scale single-chip HBM cannot hold), not a
    # tuned training recipe — the lr just keeps the losses far from
    # overflow.
    opt = optax.sgd(1e-6)
    opt_state = opt.init(params)

    # Bundle through the jit boundary as an ARGUMENT (CLAUDE.md
    # invariant — closure capture bakes the multi-GB shards as
    # constants).
    @jax.jit
    def step(p, s, bundle, bufs, tgt_d):
        def loss_fn(pp):
            loss, aux = adapter.train_stats(
                {"params": pp, "buffers": bufs}, bundle, tgt_d, cw, None,
            )
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        u, s = opt.update(grads, s)
        return optax.apply_updates(p, u), s, loss

    bundle = adapter.bundles["train"]
    t0 = time.perf_counter()
    params, opt_state, loss = step(params, opt_state, bundle, buffers, tgt)
    l0 = float(loss)
    res["first_step_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    params, opt_state, loss = step(params, opt_state, bundle, buffers, tgt)
    l1 = float(loss)
    res["second_step_s"] = round(time.perf_counter() - t0, 1)
    res["losses"] = [round(l0, 5), round(l1, 5)]
    assert np.isfinite(l0) and np.isfinite(l1)
    Path(args.out).write_text(json.dumps(res, indent=1))
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
