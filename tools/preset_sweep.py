"""Smoke-sweep every preset end-to-end (2 epochs), incl. synthetic raw data.

    python tools/preset_sweep.py [--epochs 2] [--only PREFIX] [--out results/]

The 18 self-contained presets (chess/SBM/SEIR) run on their real/in-repo
data; the 32 external-dataset presets (bitcoin/reddit/uci/amlsim) run on
the synthetic raw files from preprocess/synthetic_raw.py (generated into
data/synthetic/ on demand — the real KONECT/SNAP files need network).
Writes one summary line per preset and a JSON table.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SELF_CONTAINED_DIRS = {"chess": REPO / "data/chess"}


def data_dir_for(dataset: str) -> Path | None:
    if dataset in ("sbm", "seir"):
        return None
    if dataset in SELF_CONTAINED_DIRS:
        return SELF_CONTAINED_DIRS[dataset]
    d = REPO / "data/synthetic" / dataset
    from tmgcn_tpu.preprocess.datasets import REGISTRY
    from tmgcn_tpu.preprocess.synthetic_raw import generate

    if not (d / REGISTRY[dataset].filename).exists():
        generate(dataset, d, seed=0)
    return d


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--only", default="")
    ap.add_argument("--out", default="results")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/tmgcn_jax_cache")

    from tmgcn_tpu.configs.build import run_experiment
    from tmgcn_tpu.configs.presets import PRESETS

    rows = []
    names = [n for n in sorted(PRESETS) if n.startswith(args.only)]
    print(f"sweeping {len(names)} presets on {jax.default_backend()}", flush=True)
    for name in names:
        cfg = PRESETS[name]
        t0 = time.time()
        try:
            out = run_experiment(
                cfg,
                data_dir=data_dir_for(cfg.dataset),
                n_epochs=args.epochs,
                alpha_vec=(cfg.alpha_vec[0],) if cfg.task != "regression" else None,
                verbose=False,
            )
            res = next(iter(out["results"].values()))
            if isinstance(res, dict):  # regression
                final = float(res["train_loss"][-1])
            else:
                final = float(res[-1, 3 if res.shape[1] == 12 else 2])
            row = {
                "preset": name,
                "ok": True,
                "final_train_loss": final,
                "seconds": round(time.time() - t0, 1),
            }
        except Exception as e:
            traceback.print_exc()
            row = {
                "preset": name,
                "ok": False,
                "error": f"{type(e).__name__}: {e}"[:200],
                "seconds": round(time.time() - t0, 1),
            }
        rows.append(row)
        print(json.dumps(row), flush=True)

    ok = sum(r["ok"] for r in rows)
    out_dir = Path(args.out)
    out_dir.mkdir(exist_ok=True)
    (out_dir / "preset_sweep.json").write_text(json.dumps(rows, indent=1))
    summary = [
        f"preset sweep: {ok}/{len(rows)} ok, epochs={args.epochs}, "
        f"backend={jax.default_backend()}"
    ] + [
        f"{r['preset']:32s} {'OK ' if r['ok'] else 'FAIL'} {r['seconds']:7.1f}s "
        + (f"loss={r.get('final_train_loss', float('nan')):.5f}" if r["ok"] else r["error"])
        for r in rows
    ]
    (out_dir / "preset_sweep_summary.txt").write_text("\n".join(summary) + "\n")
    print(summary[0])
    return 0 if ok == len(rows) else 1


if __name__ == "__main__":
    raise SystemExit(main())
