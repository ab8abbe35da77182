"""Minimized per-component compile probes for the 500k recurrent ceiling.

Each --component is a self-contained jitted fwd+bwd program at the
target scale, no adapter machinery — whichever fails pins the compiler
fault to one op family. ALL operand data is generated ON DEVICE
(jax.random / iota) and materialized before the probe compiles: host
arrays of this size take minutes through the ~0.5 GB/s axon tunnel and
would masquerade as compile hangs (CLAUDE.md).

  lstm       rolled lstm_scan (WD-GCN recurrence) on random (T, N, F1)
  lstm_full  fully-unrolled lstm_scan (T<=128 heuristic path)
  gru        EvolveGCN evolve_weight_stack + batched einsum
  spmm       flat gather/segment-sum SpMM (the jnp impl) on device COO
  readout    edge_readout fwd+bwd (XLA scatter transpose), E edges
  matmul     the (T, N, F0) @ (F0, F1) epoch matmul (control)

    python tools/recurrent_min_repro.py --component lstm --nodes 500000

Appends to results/recurrent_boundary.jsonl with family="component",
recording data_s (device data materialization) and compile_run_s
separately.
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
    ap.add_argument("--component", required=True)
    ap.add_argument("--nodes", type=int, default=500_000)
    ap.add_argument("--slices", type=int, default=64)
    ap.add_argument("--feat", type=int, default=6)
    ap.add_argument("--nnz-per-slice", type=int, default=2_000_000)
    ap.add_argument("--edges", type=int, default=1_000_000)
    ap.add_argument("--unroll", type=int, default=8)
    ap.add_argument("--tag", default=None)
    ap.add_argument("--out", default="results/recurrent_boundary.jsonl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/tmgcn_jax_cache")

    T, N, F = args.slices, args.nodes, args.feat
    key = jax.random.PRNGKey(0)
    row = {"family": "component", "component": args.component,
           "nodes": N, "slices": T, "feat": F, "unroll": args.unroll,
           "tag": args.tag}

    def dev_normal(shape, k):
        out = jax.jit(
            lambda kk: jax.random.normal(kk, shape, jnp.float32)
        )(k)
        _ = float(out.ravel()[0])  # force materialization (tunnel rule)
        return out

    try:
        t0 = time.perf_counter()
        stage_data = None
        if args.component in ("lstm", "lstm_full"):
            from tmgcn_tpu.models.wdgcn import _init_lstm, lstm_scan

            params, bufs = _init_lstm(jax.random.PRNGKey(0), F, jnp.float32)
            Y = dev_normal((T, N, F), key)
            row["data_s"] = round(time.perf_counter() - t0, 1)
            t0 = time.perf_counter()
            unroll = None if args.component == "lstm_full" else args.unroll

            def f(p, y):
                return lstm_scan(p, bufs["h_init"], bufs["c_init"], y,
                                 unroll=unroll).sum()

            val = float(jax.jit(jax.value_and_grad(f))(params, Y)[0])
        elif args.component == "gru":
            from tmgcn_tpu.models.evolvegcn import _init_cell, evolve_weight_stack

            cell = _init_cell(jax.random.PRNGKey(0), 2, F, jnp.float32)
            X = dev_normal((T, N, 2), key)
            row["data_s"] = round(time.perf_counter() - t0, 1)
            t0 = time.perf_counter()

            def f(c, x):
                _, Ws = evolve_weight_stack(c, x, W0=c["B_Z"])
                return jnp.einsum("tnf,tfk->tnk", x, Ws).sum()

            val = float(jax.jit(jax.value_and_grad(f))(cell, X)[0])
        elif args.component == "spmm":
            from tmgcn_tpu.core.sparse import TemporalCOO
            from tmgcn_tpu.ops.spmm import spmm

            P = args.nnz_per_slice

            @jax.jit
            def make_coo(k):
                # Sorted rows via a stretched iota; random cols.
                rows = (
                    jax.lax.broadcasted_iota(jnp.int32, (T, P), 1)
                    * (N // P if N >= P else 1)
                    + (jax.lax.broadcasted_iota(jnp.int32, (T, P), 1) % max(N // P, 1)
                       if N >= P else 0)
                ) % N
                rows = jnp.sort(rows, axis=1)
                cols = jax.random.randint(k, (T, P), 0, N, jnp.int32)
                vals = jnp.ones((T, P), jnp.float32)
                nnz = jnp.full((T,), P, jnp.int32)
                return rows, cols, vals, nnz

            rows, cols, vals, nnz = make_coo(key)
            _ = int(rows.ravel()[0])
            A = TemporalCOO(rows=rows, cols=cols, vals=vals, nnz=nnz, n_nodes=N)
            X = dev_normal((T, N, 2), key)
            row["data_s"] = round(time.perf_counter() - t0, 1)
            t0 = time.perf_counter()

            def f(x):
                return spmm(A, x).sum()

            val = float(jax.jit(jax.value_and_grad(f))(X)[0])
        elif args.component == "readout":
            from tmgcn_tpu.ops.edge_readout import edge_readout

            E = args.edges
            k1, k2, k3 = jax.random.split(key, 3)

            @jax.jit
            def make_edges(ka, kb, kc):
                return jnp.stack([
                    jax.random.randint(ka, (E,), 0, T, jnp.int32),
                    jax.random.randint(kb, (E,), 0, N, jnp.int32),
                    jax.random.randint(kc, (E,), 0, N, jnp.int32),
                ])

            edges = make_edges(k1, k2, k3)
            _ = int(edges.ravel()[0])
            Z = dev_normal((T, N, F), k1)
            U = jnp.asarray(
                np.random.default_rng(0).standard_normal((2 * F, 2)), jnp.float32
            )
            row["data_s"] = round(time.perf_counter() - t0, 1)
            t0 = time.perf_counter()

            def f(z, u):
                return edge_readout(z, edges, u).sum()

            val = float(jax.jit(jax.value_and_grad(f, argnums=(0, 1)))(Z, U)[0])
        elif args.component == "matmul":
            X = dev_normal((T, N, 2), key)
            W = jnp.asarray(
                np.random.default_rng(0).standard_normal((2, F)), jnp.float32
            )
            row["data_s"] = round(time.perf_counter() - t0, 1)
            t0 = time.perf_counter()

            def f(x, w):
                return jax.nn.relu(jnp.matmul(x, w)).sum()

            val = float(jax.jit(jax.value_and_grad(f))(X, W)[0])
        else:
            raise ValueError(args.component)
        row["compile_run_s"] = round(time.perf_counter() - t0, 1)
        row["ok"] = True
        row["value_finite"] = bool(np.isfinite(val))
    except Exception as e:  # noqa: BLE001 — the failure IS the datum
        row["ok"] = False
        row["error"] = str(e)[:300]

    with open(REPO / args.out, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
