"""Assemble the chess LP 21-alpha sweep table from per-leg artifacts.

    python tools/alpha_sweep_table.py

Reads results/protocol_chess/{ref,ours}_tmgcn1_lp[_aNN].json (the 0.90
leg has no suffix) and writes results/alpha_sweep_table.md with one row
per alpha and a best-alpha summary per side.
"""

from __future__ import annotations

import json
from pathlib import Path

OUT_DIR = Path(__file__).resolve().parent.parent / "results/protocol_chess"
TABLE = Path(__file__).resolve().parent.parent / "results/alpha_sweep_table.md"


def leg(side: str, w: int) -> dict | None:
    name = f"{side}_tmgcn1_lp.json" if w == 90 else f"{side}_tmgcn1_lp_a{w}.json"
    p = OUT_DIR / name
    if not p.exists():
        return None
    return json.loads(p.read_text())


def main() -> int:
    rows = []
    for i in range(21):
        w = 75 + i
        r, o = leg("ref", w), leg("ours", w)
        rows.append((w / 100, r, o))

    def fmt(d, k):
        return f"{d[k]['map']:.4f}" if d else "—"

    lines = [
        "# Chess LP protocol α sweep (1000 epochs, shared seeded negatives)",
        "",
        "Reference: experiment_chess_our_link_prediction.py's 21-value",
        "alpha_vec (:23) at protocol length, both frameworks on the",
        "identical artifact + negative set (tools/protocol_chess.py).",
        "",
        "| α | ref val MAP | ref test MAP | ours val MAP | ours test MAP |",
        "|---|---|---|---|---|",
    ]
    for a, r, o in rows:
        lines.append(
            f"| {a:.2f} | {fmt(r, 'val')} | {fmt(r, 'test')} | "
            f"{fmt(o, 'val')} | {fmt(o, 'test')} |"
        )
    done_r = [x for x in rows if x[1]]
    done_o = [x for x in rows if x[2]]
    lines.append("")
    if done_r:
        best = max(done_r, key=lambda x: x[1]["val"]["map"])
        lines.append(
            f"Best-α (reference, by val MAP): α={best[0]:.2f} — "
            f"val {best[1]['val']['map']:.4f}, test {best[1]['test']['map']:.4f}."
        )
    if done_o:
        best = max(done_o, key=lambda x: x[2]["val"]["map"])
        lines.append(
            f"Best-α (ours, by val MAP): α={best[0]:.2f} — "
            f"val {best[2]['val']['map']:.4f}, test {best[2]['test']['map']:.4f}."
        )
    lines.append(
        f"\nLegs present: ref {len(done_r)}/21, ours {len(done_o)}/21."
    )
    TABLE.write_text("\n".join(lines) + "\n")
    print("\n".join(lines[-6:]))
    print(f"wrote {TABLE}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
