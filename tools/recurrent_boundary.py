"""Bisect the recurrent-family (EvolveGCN / WD-GCN) compile ceiling.

Round-4 left both families failing to compile at 500k nodes
(`remote_compile HTTP 500`, results/scale_bench_500k_recurrent.json)
while TM-GCN compiled and ran at 1M. This tool isolates the cause by
compiling ONE training-step chunk per invocation with ablation levers:

  --unroll N          WD-GCN LSTM scan unroll override (None = full
                      unroll at T<=128 — the suspected program-size
                      bomb at large N)
  --no-readout-plan   drop the prepacked Pallas readout-backward plan
                      (fall back to XLA's scatter transpose)
  --ablate-head       replace the edge readout with sum(Z) (isolates
                      the recurrence from the readout)

Each run appends a row to results/recurrent_boundary.jsonl:
    {"family", "nodes", "unroll", "readout_plan", "head",
     "ok", "compile_s", "ms_per_epoch" | "error"}

Findings are written up in results/recurrent_compile_boundary.md.
Structures under test: evolvegcn_functions.py:165-171 /
wd_gcn_functions.py:86-98 (the reference's sequential recurrences).
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

from tools.bench_scale import build_inputs as _build_inputs  # noqa: E402


def build_inputs(nodes, slices, nnz_per_slice, edges, band):
    """bench_scale.build_inputs with an on-disk cache (the ~3 min host
    build dominates each bisect step otherwise)."""
    from tmgcn_tpu.core.sparse import TemporalCOO

    key = f"rb_{nodes}_{slices}_{nnz_per_slice}_{edges}_{band}"
    cache = Path("/tmp") / f"{key}.npz"
    if cache.exists():
        z = np.load(cache)
        A = TemporalCOO(
            rows=z["rows"], cols=z["cols"], vals=z["vals"], nnz=z["nnz"],
            n_nodes=int(z["n_nodes"]),
        )
        return A, z["M"], z["X"], z["edges"], z["tgt"], z["cw"]
    A, M, X, e, tgt, cw = _build_inputs(nodes, slices, nnz_per_slice, edges, band)
    np.savez(
        cache, rows=np.asarray(A.rows), cols=np.asarray(A.cols),
        vals=np.asarray(A.vals), nnz=np.asarray(A.nnz),
        n_nodes=A.n_nodes, M=M, X=X, edges=e, tgt=tgt, cw=cw,
    )
    return A, M, X, e, tgt, cw


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=["evolvegcn", "wdgcn"], required=True)
    ap.add_argument("--nodes", type=int, default=500_000)
    ap.add_argument("--slices", type=int, default=64)
    ap.add_argument("--nnz-per-slice", type=int, default=2_000_000)
    ap.add_argument("--edges", type=int, default=1_000_000)
    ap.add_argument("--band", type=int, default=20)
    ap.add_argument("--unroll", type=int, default=None)
    ap.add_argument("--no-readout-plan", action="store_true")
    ap.add_argument("--ablate-head", action="store_true")
    ap.add_argument("--n-timed", type=int, default=3)
    ap.add_argument("--tag", default=None, help="free-form row tag (e.g. fresh_device)")
    ap.add_argument("--out", default="results/recurrent_boundary.jsonl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/tmgcn_jax_cache")

    from tmgcn_tpu.models.evolvegcn import EvolveGCN
    from tmgcn_tpu.models.wdgcn import WDGCN
    from tmgcn_tpu.tasks.adapters import make_edge_adapter
    from tmgcn_tpu.train.losses import weighted_cross_entropy

    row = {
        "family": args.family, "nodes": args.nodes, "slices": args.slices,
        "nnz_per_slice": args.nnz_per_slice, "edges": args.edges,
        "unroll": args.unroll,
        "readout_plan": not args.no_readout_plan,
        "tag": args.tag,
        "head": "none" if args.ablate_head else "readout",
    }
    t0 = time.perf_counter()
    A, M, X, edges, tgt_np, cw_np = build_inputs(
        args.nodes, args.slices, args.nnz_per_slice, args.edges, args.band
    )
    tgt = jnp.asarray(tgt_np)
    cw = jnp.asarray(cw_np)
    print(f"# inputs built in {time.perf_counter() - t0:.0f}s", file=sys.stderr)

    if args.family == "wdgcn":
        model = WDGCN(n_slices=args.slices, in_feat=X.shape[-1],
                      hidden_feat=(6, 2), scan_unroll=args.unroll)
    else:
        model = EvolveGCN(n_slices=args.slices, in_feat=X.shape[-1],
                          hidden_feat=(6, 2))

    adj = {w: A for w in ("train", "val", "test")}
    feats = {w: X for w in ("train", "val", "test")}
    edict = {w: edges for w in ("train", "val", "test")}

    try:
        t0 = time.perf_counter()
        adapter = make_edge_adapter(model, adj, feats, edict)
        if args.no_readout_plan:
            for b in {id(b): b for b in adapter.bundles.values()}.values():
                b.pop("readout", None)
        row["build_s"] = round(time.perf_counter() - t0, 1)

        variables = adapter.init(jax.random.PRNGKey(0))
        params, buffers = variables["params"], variables["buffers"]
        opt = optax.sgd(0.01, momentum=0.9)
        opt_state = opt.init(params)
        from functools import partial

        @partial(jax.jit, static_argnames="n")
        def chunk(params, opt_state, bundle, bufs, tgt_d, n):
            def body(carry, _):
                p, s = carry

                def loss_fn(pp):
                    with jax.default_matmul_precision("highest"):
                        out, _ = adapter.apply(
                            {"params": pp, "buffers": bufs}, bundle, ()
                        )
                    if args.ablate_head:
                        return jnp.sum(out * out) * 0.0 + jnp.sum(out)
                    return weighted_cross_entropy(out, tgt_d, cw)

                loss, g = jax.value_and_grad(loss_fn)(p)
                u, s = opt.update(g, s)
                return (optax.apply_updates(p, u), s), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), None, length=n
            )
            return params, opt_state, losses

        bundle = dict(adapter.bundles["train"])
        if args.ablate_head:
            # Head ablation still flows through apply(); out is logits.
            pass
        t0 = time.perf_counter()
        params, opt_state, losses = chunk(
            params, opt_state, bundle, buffers, tgt, args.n_timed
        )
        _ = float(losses.sum())
        row["compile_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        params, opt_state, losses = chunk(
            params, opt_state, bundle, buffers, tgt, args.n_timed
        )
        _ = float(losses.sum())
        row["ms_per_epoch"] = round(
            (time.perf_counter() - t0) / args.n_timed * 1e3, 2
        )
        row["ok"] = True
    except Exception as e:  # noqa: BLE001 — the failure IS the datum
        row["ok"] = False
        row["error"] = str(e)[:400]

    with open(REPO / args.out, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
