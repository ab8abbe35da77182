"""Locate the 1M-node restricted-2-layer OOM stage (directive #5 prep).

Builds the TMGCN2 readout-restricted adapter at the scale_bench_1m
shape and walks the epoch in stages — device stats after each — so the
streaming fix targets the actual allocation:

    python tools/stream2_probe.py [--nodes 1000000] [--nnz-per-slice 3000000]

Appends a row to results/stream2_probe.jsonl.
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

from tools.recurrent_boundary import build_inputs  # cached  # noqa: E402


def mem(tag, row):
    import jax

    try:
        s = jax.local_devices()[0].memory_stats()
        row[f"mem_{tag}_mb"] = round(s.get("bytes_in_use", 0) / 1e6)
        print(f"# {tag}: {row[f'mem_{tag}_mb']} MB in use", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        row[f"mem_{tag}"] = f"unavailable: {e}"[:120]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--slices", type=int, default=64)
    ap.add_argument("--nnz-per-slice", type=int, default=3_000_000)
    ap.add_argument("--edges", type=int, default=2_000_000)
    ap.add_argument("--band", type=int, default=20)
    ap.add_argument("--out", default="results/stream2_probe.jsonl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/tmgcn_jax_cache")

    from tmgcn_tpu.models.tmgcn import TMGCN2
    from tmgcn_tpu.tasks.adapters import make_edge_adapter
    from tmgcn_tpu.train.losses import weighted_cross_entropy

    row = {"nodes": args.nodes, "slices": args.slices,
           "nnz_per_slice": args.nnz_per_slice, "edges": args.edges}
    t0 = time.perf_counter()
    A, M, X, edges, tgt_np, cw_np = build_inputs(
        args.nodes, args.slices, args.nnz_per_slice, args.edges, args.band
    )
    tgt = jnp.asarray(tgt_np)
    cw = jnp.asarray(cw_np)
    row["build_host_s"] = round(time.perf_counter() - t0, 1)
    print(f"# inputs {row['build_host_s']}s", file=sys.stderr)
    mem("inputs", row)

    model = TMGCN2(n_slices=args.slices, in_feat=X.shape[-1],
                   hidden_feat=(6, 6, 2), nonlin2="selu")
    adj = {w: A for w in ("train", "val", "test")}
    feats = {w: X for w in ("train", "val", "test")}
    edict = {w: edges for w in ("train", "val", "test")}
    stage = "adapter_build"
    try:
        t0 = time.perf_counter()
        adapter = make_edge_adapter(model, adj, feats, edict, M=M)
        row["adapter_build_s"] = round(time.perf_counter() - t0, 1)
        mem("adapter", row)
        b = adapter.bundles["train"]
        for k in ("l2_Hin", "cached", "X"):
            if k in b:
                v = b[k]
                row[f"{k}_shape"] = list(v.shape)
        if "l2op" in b:
            row["l2op_type"] = type(b["l2op"]).__name__

        variables = adapter.init(jax.random.PRNGKey(0))
        params, buffers = variables["params"], variables["buffers"]

        stage = "forward"
        fwd = jax.jit(
            lambda p, bundle, bufs: adapter.apply(
                {"params": p, "buffers": bufs}, bundle, ()
            )[0].sum()
        )
        t0 = time.perf_counter()
        v = float(fwd(params, b, buffers))
        row["forward_compile_s"] = round(time.perf_counter() - t0, 1)
        row["forward_ok"] = bool(np.isfinite(v))
        mem("forward", row)

        stage = "grad"

        def loss_fn(p, bundle, bufs):
            out, _ = adapter.apply({"params": p, "buffers": bufs}, bundle, ())
            return weighted_cross_entropy(out, tgt, cw)

        g = jax.jit(jax.value_and_grad(loss_fn))
        t0 = time.perf_counter()
        loss, grads = g(params, b, buffers)
        loss = float(loss)
        row["grad_compile_s"] = round(time.perf_counter() - t0, 1)
        row["grad_ok"] = bool(np.isfinite(loss))
        mem("grad", row)
        row["ok"] = True
    except Exception as e:  # noqa: BLE001 — the failure IS the datum
        row["ok"] = False
        row["failed_stage"] = stage
        row["error"] = str(e)[:400]
        mem("fail", row)

    with open(REPO / args.out, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
