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
    "chess_wdgcn_cls",      # per-node LSTM over time (lax.scan)
)


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
        splits = split_edges_classification(
            data.edge_index, data.edge_values, data.spec, n_classes=cfg.n_classes
        )
        dt, n_edges = bench_ours(cfg, data, splits, n_timed=args.n)
        out["epoch_ms"][name] = round(dt * 1e3, 3)
        print(
            f"{name:22s} {dt * 1e3:8.3f} ms/epoch ({n_edges} edges)", flush=True
        )

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
