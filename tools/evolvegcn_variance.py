"""Consolidate the EvolveGCN chess cls variance evidence into one table.

    python tools/evolvegcn_variance.py

Reads results/protocol_chess/{ours_evolvegcn_cls*.json,
ref_evolvegcn_cls*.json} and writes results/evolvegcn_variance.md:
per-run val/test class-0 F1 + accuracy for both frameworks, showing the
bimodal basin structure (VERDICT round-3 weak #4 closure).
"""

from __future__ import annotations

import glob
import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / "results/evolvegcn_variance.md"


def main() -> int:
    rows = []
    for f in sorted(glob.glob(str(REPO / "results/protocol_chess/ours_evolvegcn_cls*.json"))):
        d = json.loads(Path(f).read_text())
        suffix = Path(f).stem.removeprefix("ours_evolvegcn_cls")
        tag = suffix.strip("_") or "canonical (TPU, post-precision-fix)"
        rows.append(("ours", tag, d))
    for f in sorted(glob.glob(str(REPO / "results/protocol_chess/ref_evolvegcn_cls*.json"))):
        d = json.loads(Path(f).read_text())
        suffix = Path(f).stem.removeprefix("ref_evolvegcn_cls")
        rows.append(("reference", suffix.strip("_") or "r0", d))

    def fmt(x):
        return "nan" if x != x else f"{x:.3f}"

    lines = [
        "# EvolveGCN-2 chess cls: run-to-run variance (both frameworks)",
        "",
        "10k-epoch protocol, identical artifact, fixed class weights",
        "[1/3,1/3,1/3]. The reference is unseeded; ours varies the init",
        "key. Class-0 (black-win) F1 is BIMODAL on both sides: runs land",
        "either in a class-0-predicting basin (~0.2-0.4) or a",
        "majority-class basin (~0.0-0.05/nan). The round-3 'collapse' was",
        "one draw of this distribution, not an eval bug (W/W2 threading",
        "verified against experiment_bitcoin_evolvegcn.py:132-148).",
        "",
        "| side | run | train F1c0 | val F1c0 | test F1c0 | test acc |",
        "|---|---|---|---|---|---|",
    ]
    for side, tag, d in rows:
        lines.append(
            f"| {side} | {tag} | {fmt(d['train']['f1_class0'])} | "
            f"{fmt(d['val']['f1_class0'])} | {fmt(d['test']['f1_class0'])} | "
            f"{d['test']['accuracy']:.3f} |"
        )
    OUT.write_text("\n".join(lines) + "\n")
    print("\n".join(lines))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
