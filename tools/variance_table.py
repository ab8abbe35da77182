"""Aggregate both-sides repeat brackets for the protocol rows that were
single runs (VERDICT round-4 directive #4).

Collects results/protocol_chess/{ref,ours}_<family>_{lp,cls}[_rN|_sN].json
into per-metric [min, max] brackets per side, marks overlap, and writes
results/variance_brackets.json + a markdown table to stdout.

    python tools/variance_table.py
"""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
OUT_DIR = REPO / "results/protocol_chess"


def collect(side: str, family: str, task: str) -> list[dict]:
    tags = [""] + [f"_r{i}" for i in range(1, 6)] + [f"_s{i}" for i in range(10)]
    out = []
    for t in tags:
        p = OUT_DIR / f"{side}_{family}_{task}{t}.json"
        if p.exists():
            out.append(json.loads(p.read_text()))
    return out


def bracket(runs: list[dict], path: tuple[str, ...]) -> tuple[float, float] | None:
    import math

    vals = []
    n_nan = 0
    for r in runs:
        d = r
        try:
            for k in path:
                d = d[k]
            v = float(d)
        except (KeyError, TypeError):
            continue
        if math.isnan(v):
            # A NaN F1 is "zero predicted positives" (the reference's
            # 0/0); record it separately, don't poison the bracket.
            n_nan += 1
        else:
            vals.append(v)
    if not vals:
        return None
    return (min(vals), max(vals), n_nan)


def overlap(a, b) -> bool | None:
    if a is None or b is None:
        return None
    return a[0] <= b[1] and b[0] <= a[1]


def main() -> int:
    rows = []
    specs = [
        ("evolvegcn", "lp", [("train", "map"), ("val", "map"), ("test", "map")]),
        ("wdgcn", "lp", [("train", "map"), ("val", "map"), ("test", "map")]),
        ("tmgcn2", "cls", [
            ("train", "f1_class0"), ("val", "f1_class0"), ("test", "f1_class0"),
            ("val", "accuracy"), ("test", "accuracy"),
        ]),
    ]
    for family, task, metrics in specs:
        refs = collect("ref", family, task)
        ours = collect("ours", family, task)
        for path in metrics:
            br = bracket(refs, path)
            bo = bracket(ours, path)
            rows.append({
                "family": family, "task": task,
                "metric": "/".join(path),
                "n_ref": len(refs), "n_ours": len(ours),
                "ref_bracket": br, "ours_bracket": bo,
                "overlap": overlap(br, bo),
            })

    (REPO / "results/variance_brackets.json").write_text(
        json.dumps(rows, indent=1)
    )
    print("| family | task | metric | ref (n) bracket | ours (n) bracket | overlap |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        fmt = lambda b: "—" if b is None else (
            f"[{b[0]:.4f}, {b[1]:.4f}]" + (f" +{b[2]}nan" if len(b) > 2 and b[2] else "")
        )
        print(
            f"| {r['family']} | {r['task']} | {r['metric']} "
            f"| {fmt(r['ref_bracket'])} ({r['n_ref']}) "
            f"| {fmt(r['ours_bracket'])} ({r['n_ours']}) "
            f"| {'YES' if r['overlap'] else ('no' if r['overlap'] is not None else '—')} |"
        )
    print("wrote results/variance_brackets.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
