"""Production-scale single-chip benchmark: large synthetic dynamic graph.

The reference's datasets top out at ~7k nodes / 65k edges; this measures
the framework at the scale the design targets (SURVEY.md §7 north star):
a power-law temporal graph with hundreds of thousands of nodes and
millions of adjacency nonzeros, trained with the same adapter/loop
machinery as every preset (1-layer cached path and the
readout-restricted 2-layer path).

    python tools/bench_scale.py [--nodes 500000] [--slices 64]
        [--nnz-per-slice 2000000] [--edges 1000000] [--out results/scale_bench.json]

Reports steady-state ms/epoch and labeled-edges/s on the real chip.
Timing forces device-side scalar fetches (axon tunnel rule) and scans
epochs on device.
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


def build_graph(n_nodes: int, n_slices: int, nnz_per_slice: int, seed: int = 0):
    """Power-law temporal adjacency, row-sorted per slice, normalized."""
    from tmgcn_tpu.core.sparse import TemporalCOO

    rng = np.random.default_rng(seed)
    pop = rng.pareto(1.3, n_nodes) + 1.0
    p = pop / pop.sum()
    slices = []
    for _ in range(n_slices):
        r = rng.choice(n_nodes, nnz_per_slice, p=p).astype(np.int64)
        c = rng.choice(n_nodes, nnz_per_slice, p=p).astype(np.int64)
        order = np.argsort(r, kind="stable")
        r, c = r[order], c[order]
        # D^{-1/2} (B+I) D^{-1/2}-style value scale (approximate degree
        # normalization keeps activations bounded; the bench measures
        # throughput, not accuracy).
        v = np.full(len(r), 1.0 / np.sqrt(nnz_per_slice / n_nodes), np.float32)
        slices.append((r, c, v))
    return TemporalCOO.from_slices(slices, n_nodes, dtype=np.float32)


def build_inputs(n_nodes, n_slices, nnz_per_slice, n_edges, band, seed=1):
    """Shared synthetic workload for the scale benches (single-chip AND
    sharded demo must measure the identical inputs)."""
    from tmgcn_tpu.core.mmatrix import make_m_matrix as _mk
    from tmgcn_tpu.ops.degree import degree_features_np as _deg

    A = build_graph(n_nodes, n_slices, nnz_per_slice)
    M = _mk(n_slices, band).astype(np.float32)
    X = _deg(A).astype(np.float32)
    rng = np.random.default_rng(seed)
    edges = np.stack([
        rng.integers(0, n_slices, n_edges),
        rng.integers(0, n_nodes, n_edges),
        rng.integers(0, n_nodes, n_edges),
    ]).astype(np.int64)
    tgt = rng.integers(0, 2, n_edges)
    cw = np.array([0.9, 0.1], np.float32)
    return A, M, X, edges, tgt, cw


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=500_000)
    ap.add_argument("--slices", type=int, default=64)
    ap.add_argument("--nnz-per-slice", type=int, default=2_000_000)
    ap.add_argument("--edges", type=int, default=1_000_000)
    ap.add_argument("--band", type=int, default=20)
    ap.add_argument("--n-timed", type=int, default=20)
    ap.add_argument("--l2-stream", type=int, default=None,
                    help="stream the tmgcn2 restricted layer-2 over this "
                         "many time chunks (1M-node HBM configuration)")
    ap.add_argument(
        "--families", default="tmgcn1,tmgcn2",
        help="comma list of tmgcn1,tmgcn2,evolvegcn,wdgcn",
    )
    ap.add_argument("--out", default="results/scale_bench.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from tmgcn_tpu.models.tmgcn import TMGCN, TMGCN2
    from tmgcn_tpu.tasks.adapters import make_edge_adapter
    from tmgcn_tpu.train.losses import weighted_cross_entropy

    res = {
        "nodes": args.nodes, "slices": args.slices,
        "nnz_per_slice": args.nnz_per_slice, "edges": args.edges,
        "backend": jax.default_backend(),
    }
    t0 = time.perf_counter()
    A, M, X, edges, tgt_np, cw_np = build_inputs(
        args.nodes, args.slices, args.nnz_per_slice, args.edges, args.band
    )
    tgt = jnp.asarray(tgt_np)
    cw = jnp.asarray(cw_np)
    res["build_host_s"] = round(time.perf_counter() - t0, 1)
    print(f"# built: {A.n_slices}x{A.n_nodes}, "
          f"{int(np.asarray(A.nnz).sum())} nnz, host {res['build_host_s']}s",
          file=sys.stderr)

    # All three windows share the same objects: the adapter dedupes
    # identical windows to ONE device copy (tasks/adapters.py), so this
    # costs a single transfer of A/X/edges.
    adj = {w: A for w in ("train", "val", "test")}
    feats = {w: X for w in ("train", "val", "test")}
    edict = {w: edges for w in ("train", "val", "test")}

    def timed_epochs(adapter, n_timed):
        variables = adapter.init(jax.random.PRNGKey(0))
        params, buffers = variables["params"], variables["buffers"]
        opt = optax.sgd(0.01, momentum=0.9)
        opt_state = opt.init(params)

        from functools import partial

        # Bundle/targets/buffers pass through the jit boundary as
        # ARGUMENTS — closure capture would bake the multi-hundred-MB
        # cached propagation into the HLO as constants (CLAUDE.md
        # invariant).
        @partial(jax.jit, static_argnames="n")
        def chunk(params, opt_state, bundle, bufs, tgt_d, n):
            def body(carry, _):
                p, s = carry

                def loss_fn(pp):
                    with jax.default_matmul_precision("highest"):
                        out, _ = adapter.apply(
                            {"params": pp, "buffers": bufs}, bundle, ()
                        )
                    return weighted_cross_entropy(out, tgt_d, cw)

                loss, g = jax.value_and_grad(loss_fn)(p)
                u, s = opt.update(g, s)
                return (optax.apply_updates(p, u), s), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), None, length=n
            )
            return params, opt_state, losses

        bundle = adapter.bundles["train"]
        t0 = time.perf_counter()
        params, opt_state, losses = chunk(
            params, opt_state, bundle, buffers, tgt, n_timed
        )
        _ = float(losses.sum())
        compile_and_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        params, opt_state, losses = chunk(
            params, opt_state, bundle, buffers, tgt, n_timed
        )
        _ = float(losses.sum())
        dt = (time.perf_counter() - t0) / n_timed
        return dt, compile_and_first

    from tmgcn_tpu.models.evolvegcn import EvolveGCN
    from tmgcn_tpu.models.wdgcn import WDGCN

    def build_model(fam):
        f_in = X.shape[-1]
        if fam == "tmgcn1":
            return TMGCN(n_slices=args.slices, in_feat=f_in, hidden_feat=(6, 2)), M
        if fam == "tmgcn2":
            return (
                TMGCN2(n_slices=args.slices, in_feat=f_in,
                       hidden_feat=(6, 6, 2), nonlin2="selu"),
                M,
            )
        if fam == "evolvegcn":
            return EvolveGCN(n_slices=args.slices, in_feat=f_in,
                             hidden_feat=(6, 2)), None
        if fam == "wdgcn":
            return WDGCN(n_slices=args.slices, in_feat=f_in,
                         hidden_feat=(6, 2)), None
        raise KeyError(fam)

    names = {"tmgcn1": "one_layer", "tmgcn2": "two_layer",
             "evolvegcn": "evolvegcn", "wdgcn": "wdgcn"}
    for fam in args.families.split(","):
        fam = fam.strip()
        if not fam:
            continue
        key = names.get(fam, fam)
        ad = None
        try:
            t0 = time.perf_counter()
            model, Mw = build_model(fam)
            ad = make_edge_adapter(
                model, adj, feats, edict, M=Mw,
                l2_stream_chunks=args.l2_stream if fam == "tmgcn2" else None,
            )
            res[f"{key}_build_s"] = round(time.perf_counter() - t0, 1)
            n = args.n_timed if fam == "tmgcn1" else max(args.n_timed // 4, 3)
            dt, warm = timed_epochs(ad, n)
            res[f"{key}_ms_per_epoch"] = round(dt * 1e3, 2)
            res[f"{key}_edges_per_s"] = round(args.edges / dt)
            print(f"# {fam} {dt*1e3:.2f} ms/epoch "
                  f"({args.edges/dt/1e6:.1f} M edges/s), warmup {warm:.0f}s",
                  file=sys.stderr)
        except Exception as e:
            res[f"{key}_error"] = str(e)[:300]
            print(f"# {fam} failed: {e}", file=sys.stderr)
        finally:
            del ad  # free device buffers even when a family fails

    Path(args.out).write_text(json.dumps(res, indent=1))
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
