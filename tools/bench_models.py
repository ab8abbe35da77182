"""Per-model-family training-epoch benchmark (chess edge classification).

Times a steady-state full-protocol training epoch for every model family
through the standard adapter path (the same scan-chunked epoch the
training loops run), with the honest post-warmup-fetch / best-of-rounds
methodology of bench.py. Torch baselines for the recurrent families are
recorded in RESULTS.md (f64, the reference's own dtype for EvolveGCN;
see "Baseline dtypes").

    python tools/bench_models.py [--n 50]

Writes results/model_bench.json and prints one line per family.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

PRESETS = (
    "chess_tmgcn_cls",      # 1-layer fast path (gather-free)
    "chess_tmgcn2_cls",     # restricted layer-2 (per-epoch SpMM)
    "chess_gcn_cls",        # KW-GCN baseline (1-layer fast path, no M)
    "chess_evolvegcn_cls",  # sequential GRU weight evolution (lax.scan)
    "chess_evolvegcn2_cls", # staged 2-layer: GRU-only scans + batched SpMM
    "chess_wdgcn_cls",      # per-node LSTM over time (lax.scan)
    "seir_tmgcn_reg",       # (T, N) regression, cached propagation
    "seir_evolvegcn_reg",   # GRU-only scan + batched propagation
    "seir_wdgcn_reg",       # LSTM with batched input gates
)


def bench_reg(cfg, data, n_timed) -> float:
    """Steady-state regression training epoch (same methodology)."""
    from functools import partial

    import jax
    import jax.numpy as jnp
    import optax

    from bench import _timed_epochs
    from tmgcn_tpu.configs.build import build_model
    from tmgcn_tpu.tasks.adapters import make_regression_adapter
    from tmgcn_tpu.train.losses import summed_per_slice_mse

    model = build_model(cfg, data.spec.s_train, data.feats["train"].shape[-1])
    adapter = make_regression_adapter(
        model, data.adj, data.feats, M=data.M if cfg.method != "gcn" else None
    )
    variables = adapter.init(jax.random.PRNGKey(0))
    params, buffers = variables["params"], variables["buffers"]
    yt = jnp.asarray(data.reg_targets["train"])
    opt = optax.sgd(cfg.lr, momentum=cfg.momentum)
    opt_state = opt.init(params)

    @partial(jax.jit, static_argnames="n_steps")
    def train_chunk(params, opt_state, bundle, yt, n_steps):
        def body(carry, _):
            p, s = carry

            def loss_fn(p):
                out, _ = adapter.apply({"params": p, "buffers": buffers}, bundle, ())
                return summed_per_slice_mse(out, yt)

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, s = opt.update(grads, s, p)
            return (optax.apply_updates(p, updates), s), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), None, length=n_steps
        )
        return params, opt_state, losses

    bundle = adapter.bundles["train"]

    def run_chunk(n):
        return train_chunk(params, opt_state, bundle, yt, n)

    def fetch(out):
        return float(out[2].sum())

    return _timed_epochs(run_chunk, fetch, n_timed)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50, help="timed epochs per family")
    ap.add_argument("--presets", default=",".join(PRESETS))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/tmgcn_jax_cache")

    from bench import bench_ours
    from tmgcn_tpu.configs.build import build_data
    from tmgcn_tpu.configs.presets import get_preset
    from tmgcn_tpu.tasks.windows import split_edges_classification

    out = {"backend": jax.default_backend(), "n_timed": args.n, "epoch_ms": {}}
    for name in args.presets.split(","):
        cfg = get_preset(name)
        data = build_data(cfg, data_dir=str(REPO / "data/chess"))
        if cfg.task == "regression":
            dt = bench_reg(cfg, data, n_timed=args.n)
            detail = f"({data.feats['train'].shape[1]} nodes)"
        else:
            splits = split_edges_classification(
                data.edge_index, data.edge_values, data.spec, n_classes=cfg.n_classes
            )
            dt, n_edges = bench_ours(cfg, data, splits, n_timed=args.n)
            detail = f"({n_edges} edges)"
        out["epoch_ms"][name] = round(dt * 1e3, 3)
        print(f"{name:22s} {dt * 1e3:8.3f} ms/epoch {detail}", flush=True)

    path = REPO / "results/model_bench.json"
    if path.exists():  # partial runs update, not clobber, earlier numbers
        prev = json.loads(path.read_text())
        prev_ms = prev.get("epoch_ms", {})
        prev_ms.update(out["epoch_ms"])
        out["epoch_ms"] = prev_ms
    path.write_text(json.dumps(out, indent=1))
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
