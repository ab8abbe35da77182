"""Minimized per-component compile probes for the 500k recurrent ceiling.

Each --component is a self-contained jitted fwd+bwd program at the
target scale, no adapter machinery — whichever fails pins the compiler
fault to one op family:

  lstm       rolled lstm_scan (WD-GCN recurrence) on random (T, N, F1)
  lstm_full  fully-unrolled lstm_scan (T<=128 heuristic path)
  gru        EvolveGCN evolve_weight_stack + batched einsum
  spmm       flat gather/segment-sum SpMM (the jnp impl) on random A
  readout    edge_readout fwd+bwd (XLA scatter transpose), E edges
  readout_plan  the Pallas sparse-window readout backward
  matmul     the (T, N, F0)@ (F0, F1) epoch matmul (control)

    python tools/recurrent_min_repro.py --component lstm --nodes 500000

Appends to results/recurrent_boundary.jsonl with family="component".
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
    ap.add_argument("--out", default="results/recurrent_boundary.jsonl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/tmgcn_jax_cache")

    T, N, F = args.slices, args.nodes, args.feat
    rng = np.random.default_rng(0)
    row = {"family": "component", "component": args.component,
           "nodes": N, "slices": T, "feat": F, "unroll": args.unroll}

    try:
        t0 = time.perf_counter()
        if args.component in ("lstm", "lstm_full"):
            from tmgcn_tpu.models.wdgcn import _init_lstm, lstm_scan

            params, bufs = _init_lstm(jax.random.PRNGKey(0), F, jnp.float32)
            Y = jnp.asarray(
                rng.standard_normal((T, N, F)).astype(np.float32)
            )
            unroll = None if args.component == "lstm_full" else args.unroll

            def f(p, y):
                return lstm_scan(p, bufs["h_init"], bufs["c_init"], y,
                                 unroll=unroll).sum()

            val, grads = jax.jit(jax.value_and_grad(f))(params, Y)
            val = float(val)
        elif args.component == "gru":
            from tmgcn_tpu.models.evolvegcn import _init_cell, evolve_weight_stack

            cell = _init_cell(jax.random.PRNGKey(0), 2, F, jnp.float32)
            X = jnp.asarray(rng.standard_normal((T, N, 2)).astype(np.float32))
            W0 = jnp.asarray(rng.standard_normal((2, F)).astype(np.float32))

            def f(c, x):
                _, Ws = evolve_weight_stack(c, x, W0)
                return jnp.einsum("tnf,tfk->tnk", x, Ws).sum()

            val = float(jax.jit(jax.value_and_grad(f))(cell, X)[0])
        elif args.component == "spmm":
            from tmgcn_tpu.core.sparse import TemporalCOO
            from tmgcn_tpu.ops.spmm import spmm

            P = args.nnz_per_slice
            slices = []
            for _ in range(T):
                r = np.sort(rng.integers(0, N, P))
                slices.append((r, rng.integers(0, N, P), np.ones(P, np.float32)))
            A = TemporalCOO.from_slices(slices, N, dtype=np.float32)
            X = jnp.asarray(rng.standard_normal((T, N, 2)).astype(np.float32))
            A = jax.device_put(A)

            def f(x):
                return spmm(A, x).sum()

            val = float(jax.jit(jax.value_and_grad(f))(X)[0])
        elif args.component in ("readout", "readout_plan"):
            from tmgcn_tpu.ops.edge_readout import (
                apply_readout, edge_readout, make_readout_plan,
            )

            E = args.edges
            edges = jnp.asarray(np.stack([
                rng.integers(0, T, E), rng.integers(0, N, E),
                rng.integers(0, N, E),
            ]).astype(np.int32))
            Z = jnp.asarray(rng.standard_normal((T, N, F)).astype(np.float32))
            U = jnp.asarray(rng.standard_normal((2 * F, 2)).astype(np.float32))
            if args.component == "readout_plan":
                plan = make_readout_plan(np.asarray(edges), T, N)

                def f(z, u):
                    return apply_readout(plan, z, u).sum()
            else:
                def f(z, u):
                    return edge_readout(z, edges, u).sum()

            val = float(jax.jit(jax.value_and_grad(f, argnums=(0, 1)))(Z, U)[0])
        elif args.component == "matmul":
            X = jnp.asarray(rng.standard_normal((T, N, 2)).astype(np.float32))
            W = jnp.asarray(rng.standard_normal((2, F)).astype(np.float32))

            def f(x, w):
                return jax.nn.relu(jnp.matmul(x, w)).sum()

            val = float(jax.jit(jax.value_and_grad(f))(X, W)[0])
        else:
            raise ValueError(args.component)
        row["compile_and_run_s"] = round(time.perf_counter() - t0, 1)
        row["ok"] = True
        row["value_finite"] = bool(np.isfinite(val))
    except Exception as e:  # noqa: BLE001
        row["ok"] = False
        row["error"] = str(e)[:300]

    with open(REPO / args.out, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
