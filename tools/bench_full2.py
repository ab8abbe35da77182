"""Full-row 2-layer chess epoch benchmark (slow; not part of bench.py).

The driver bench (bench.py) times the readout-restricted 2-layer
adapter — the production path, where layer 2 only computes the
embedding rows the edge readout actually gathers. This tool times the
GENERIC full-row path instead: every epoch runs the complete layer-2
SpMM A ⊛ Y over all T*N rows (exactly the reference's computation
shape, embedding_help_functions.py:301-312,348-349), once per SpMM
implementation. That is the honest apples-to-apples workload for
kernel comparison, but its jnp variant alone costs ~0.4 s/epoch, which
does not fit the driver-bench budget.

    python tools/bench_full2.py [--n 8] [--impls jnp,rowsplit,pallas]

Writes results/full2_bench.json and prints one line per impl.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="timed epochs per impl")
    ap.add_argument(
        "--impls",
        default="jnp,rowsplit,pallas,pallas_bf16,blockdense,blockdense_bf16,auto,auto_bf16",
    )
    ap.add_argument("--no-torch", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/tmgcn_jax_cache")

    from bench import bench_ours2_full, bench_torch_reference2, prepare
    from tmgcn_tpu.configs.presets import get_preset

    _, data, splits = prepare()
    cfg2 = get_preset("chess_tmgcn2_cls")

    out = {"backend": jax.default_backend(), "n_timed": args.n, "full_row_ms": {}}
    for impl in args.impls.split(","):
        t0 = time.time()
        try:
            dt = bench_ours2_full(cfg2, data, splits, impl, n_timed=args.n)
            out["full_row_ms"][impl] = round(dt * 1e3, 2)
            print(
                f"full-row 2-layer [{impl:8s}] {dt * 1e3:8.2f} ms/epoch "
                f"(wall {time.time() - t0:.0f}s incl. compile)",
                flush=True,
            )
        except Exception as e:
            out["full_row_ms"][impl] = None
            print(f"full-row 2-layer [{impl:8s}] FAILED: {e}", flush=True)

    if not args.no_torch:
        ref2 = bench_torch_reference2(data, splits)
        out["torch_ms"] = round(ref2 * 1e3, 2)
        print(f"full-row 2-layer [torch   ] {ref2 * 1e3:8.2f} ms/epoch", flush=True)

        best = min((v for v in out["full_row_ms"].values() if v), default=None)
        if best:
            out["best_vs_torch"] = round(out["torch_ms"] / best, 2)
            print(f"best vs torch: {out['best_vs_torch']}x")
    (REPO / "results").mkdir(exist_ok=True)
    (REPO / "results/full2_bench.json").write_text(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
