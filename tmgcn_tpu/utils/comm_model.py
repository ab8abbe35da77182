"""Analytic communication model for the sharded TM-GCN training step.

Real multi-chip hardware is not reachable from this environment (one
v5e chip over a tunnel), so the >=80%-at-4-hosts scaling target
(BASELINE.md) cannot be measured; this module is the honest substitute:
an auditable per-step byte count for every collective the sharded path
issues (parallel/adapter.py "Data movement per step", parallel/
tmgcn_sharded.py), an ICI/DCN time estimate against public TPU v5e
bandwidths, and the resulting efficiency prediction + crossover mesh
size per workload.

Collectives counted (optimized partitioned-readout path, fwd + bwd):

  * readout psum over ``graph``: (E/t, C) partial logits per time
    bucket. Ring all-reduce moves 2(g-1)/g of the buffer per device.
  * logit all-gather over ``time``: (E/t, C) -> (E, C); (t-1)/t of the
    result per device.
  * 2-layer only: row all-gather over ``graph`` of the layer-1
    activations, (T/t, N, F1) result, (g-1)/g per device — the dominant
    term at scale.
  * gradient psum over the full mesh: 2 bytes moved per param byte
    (ring), replicated params.
  * apply_M_twice workloads only (``m2_halo`` > 0): the per-step banded
    M-mixing halo exchanges along ``time``. Each mixing moves a TOTAL of
    ``halo`` (N/g, F1) slices (across ceil(halo/T_loc) ppermute hops —
    parallel/halo.py); ``m2_halo`` is the summed slice count over all
    per-step mixings (UCI M³: two mixings x band-19 = 38). For every
    other workload the banded transform is BUILD-time traffic (the
    cached layer-1 propagation runs once per window) and is excluded.

  * Recurrent families (EvolveGCN, WD-GCN) shard over ``graph`` only
    (the time recurrence is sequential — parallel/adapter.py:571-744):
    WD-GCN and 1-layer EvolveGCN issue ONLY the readout psum and the
    gradient psum per step (LSTM is node-local; layer-1 GRU summaries
    read replicated X); 2-layer EvolveGCN adds the top-k candidate
    all-gather ((T, g*k2) values/ids + (T, g*k2, F1) rows) and ONE
    (T, N, F1) H1 all-gather for the parameter-dependent layer-2 SpMM.

Backward traffic is derived PER COLLECTIVE from the actual transpose
each primitive takes under autodiff (not a uniform 2x):

  * ``all_gather``  <-> ``reduce_scatter``: the transpose moves the
    SAME (n-1)/n of the buffer again -> factor 2.
  * ``ppermute``    <-> reverse ``ppermute``: same bytes -> factor 2.
  * ``psum`` of shard-local partials -> its transpose is the IDENTITY
    on the (already replicated) cotangent: under SPMD the upstream
    cotangent of a replicated value is resident on every device, so no
    bytes move -> factor 1 (forward only).
  * the gradient psum IS the backward's own reduction (it has no
    further transpose in a single training step) -> factor 1.

``BWD_FACTOR`` records the per-collective factor; ``step_comm_bytes``
reports the derived total plus ``uniform_2x_total`` (the old
convention) so the two can be compared — on chess_cls_2layer at 8x1
the uniform rule overstates collective bytes by ~1.3x because the two
psums (readout + grads) dominate and transpose for free.

Bandwidths are the public TPU v5e figures used by the scaling
literature (jax-ml.github.io/scaling-book): HBM 8.1e11 B/s, ICI
4.5e10 B/s one-way per link with a 2D torus (2 axes), DCN ~2.5e10 B/s
per host. bf16 traffic halves the byte counts; the model takes an
itemsize.
"""

from __future__ import annotations

import dataclasses
import json
import math

# Public TPU v5e figures (scaling-book "TPU arithmetic" tables).
HBM_BW = 8.1e11  # bytes/s
ICI_BW_LINK = 4.5e10  # bytes/s one-way per link
ICI_AXES = 2  # v5e 2D torus
DCN_BW = 2.5e10  # bytes/s per host
MXU_FLOPS = 1.97e14  # bf16 FLOP/s (v5e); f32 ~ /4


@dataclasses.dataclass(frozen=True)
class Workload:
    """One training configuration's per-step shape."""

    name: str
    T: int  # time slices in the training window
    N: int  # nodes
    F0: int  # input features
    F1: int  # hidden features
    C: int  # classes
    E: int  # labeled/augmented edges per step
    nnz: int  # adjacency nonzeros per slice
    two_layer: bool = False
    itemsize: int = 4  # 4 = f32 traffic, 2 = bf16
    # apply_M_twice (UCI M²/M³ config): per-step banded halo hops along
    # ``time`` for the layer-2 re-mixing; 0 = no per-step halo.
    m2_halo: int = 0
    # "tmgcn" (graph x time mesh), "evolvegcn" / "wdgcn" (graph-only:
    # the time recurrence is sequential — parallel/adapter.py:739).
    family: str = "tmgcn"


# The driver-benchmark configs + one deliberately scaled-up setting.
CHESS_CLS = Workload("chess_cls_1layer", 80, 7301, 2, 6, 3, 39_192, 813)
CHESS_CLS2 = Workload(
    "chess_cls_2layer", 80, 7301, 2, 6, 3, 39_192, 813, two_layer=True
)
CHESS_LP = Workload("chess_lp", 79, 7301, 2, 6, 2, 772_520, 813)
SCALED = Workload(
    "scaled_1M_nodes", 128, 1_000_000, 32, 64, 2, 20_000_000, 200_000,
    two_layer=True, itemsize=2,
)
# UCI's unique apply_M_twice + apply_M_three_times config
# (experiment_uci_our_link_prediction.py:69): TWO per-step banded
# mixings (models/tmgcn.py:124-128) at band 19 each -> 38 summed slices.
UCI_M3 = Workload(
    "uci_m3_lp", 61, 500, 2, 6, 2, 300_000, 1_200,
    two_layer=True, m2_halo=38,
)
# Recurrent families at the chess cls shape (graph-only sharding).
CHESS_EVOLVE1 = Workload(
    "chess_cls_evolvegcn1", 80, 7301, 2, 6, 3, 39_192, 813,
    family="evolvegcn",
)
CHESS_EVOLVE2 = Workload(
    "chess_cls_evolvegcn2", 80, 7301, 2, 6, 3, 39_192, 813,
    two_layer=True, family="evolvegcn",
)
CHESS_WDGCN = Workload(
    "chess_cls_wdgcn", 80, 7301, 2, 6, 3, 39_192, 813, family="wdgcn"
)
SCALED_EVOLVE2 = Workload(
    "scaled_1M_evolvegcn2", 128, 1_000_000, 32, 64, 2, 20_000_000,
    200_000, two_layer=True, itemsize=2, family="evolvegcn",
)
WORKLOADS = [
    CHESS_CLS, CHESS_CLS2, CHESS_LP, SCALED, UCI_M3,
    CHESS_EVOLVE1, CHESS_EVOLVE2, CHESS_WDGCN, SCALED_EVOLVE2,
]

# Backward transpose factor per collective (derivation: module
# docstring). 2.0 = the transpose moves the same bytes again
# (all-gather <-> reduce-scatter, ppermute <-> reverse ppermute);
# 1.0 = forward-only (psum of partials transposes to the identity on a
# replicated cotangent; the grad psum IS the backward reduction).
BWD_FACTOR = {
    "readout_psum_graph": 1.0,
    "logit_allgather_time": 2.0,
    "grad_psum": 1.0,
    "row_allgather_graph": 2.0,
    "m2_halo_ppermute_time": 2.0,
    "topk_allgather_graph": 2.0,
    "h1_allgather_graph": 2.0,
}


def ring_all_reduce_bytes(buf: int, n: int) -> float:
    """Per-device bytes moved by a ring all-reduce of a buf-byte buffer."""
    return 2 * (n - 1) / n * buf if n > 1 else 0.0


def all_gather_bytes(result: int, n: int) -> float:
    """Per-device bytes received by a ring all-gather (result = full size)."""
    return (n - 1) / n * result if n > 1 else 0.0


def step_comm_bytes(w: Workload, g: int, t: int, train_only: bool = False) -> dict:
    """Per-device per-step collective bytes for mesh (graph=g, time=t).

    ``train_only=True`` models the epochs between evaluations: the loss
    (weighted-CE mean) and the confusion counts reduce to a handful of
    scalar psums computed from shard-local logits
    (tmgcn_sharded.py:253-254), so the (E, C) logit all-gather along
    ``time`` — the asymptotic cap of the eval-step traffic, O(E)
    regardless of mesh size — drops out entirely. Evaluation epochs
    (1 in eval_every=100) still pay it to restore edge order for
    metrics.
    """
    it = w.itemsize
    if w.family != "tmgcn":
        assert t == 1, f"{w.family} shards over graph only (adapter.py:739)"
    e_bucket = w.E / max(t, 1)
    # Trainable replicated params (frozen buffers — WD-GCN U — excluded):
    if w.family == "wdgcn":
        # W (F0->F1) + hand-rolled LSTM (4 gates x (2*F1 -> F1) + bias).
        n_params = w.F0 * w.F1 + 4 * (2 * w.F1 * w.F1 + w.F1)
    elif w.family == "evolvegcn":
        # Per layer: GRU cell (3 gates x two k x k maps + bias) + score p.
        gru = lambda k: 3 * (2 * k * k + k) + k
        n_params = gru(w.F1) + (gru(w.F1) if w.two_layer else 0) \
            + 2 * w.F1 * w.C
    else:
        n_params = (
            w.F0 * w.F1 + (w.F1 * w.F1 if w.two_layer else 0)
            + 2 * w.F1 * w.C
        )
    out = {
        "readout_psum_graph": ring_all_reduce_bytes(e_bucket * w.C * it, g),
        "logit_allgather_time": (
            0.0 if train_only else all_gather_bytes(w.E * w.C * it, t)
        ),
        "grad_psum": ring_all_reduce_bytes(n_params * it, g * t),
    }
    if w.family == "evolvegcn" and w.two_layer:
        # Distributed top-k candidate all-gather: (T, g*k2) values+ids
        # and (T, g*k2, F1) candidate rows (adapter.py:678-683)...
        out["topk_allgather_graph"] = all_gather_bytes(
            w.T * g * w.F1 * (2 + w.F1) * it, g
        )
        # ...plus ONE (T, N, F1) H1 all-gather for the layer-2 SpMM
        # (adapter.py:697).
        out["h1_allgather_graph"] = all_gather_bytes(w.T * w.N * w.F1 * it, g)
    elif w.family == "tmgcn" and w.two_layer:
        out["row_allgather_graph"] = all_gather_bytes(
            (w.T / max(t, 1)) * w.N * w.F1 * it, g
        )
    if w.m2_halo and t > 1:
        # Per-step banded re-mixing: m2_halo = total (N/g, F1) slices
        # moved per step, summed over the config's mixings (see the
        # module docstring).
        out["m2_halo_ppermute_time"] = (
            w.m2_halo * w.N / max(g, 1) * w.F1 * it
        )
    # Backward transposes: per-collective derived factors (BWD_FACTOR,
    # derivation in the module docstring) — NOT a uniform 2x.
    total_fwd = sum(out.values())
    out["backward_extra"] = sum(
        (BWD_FACTOR[k] - 1.0) * v for k, v in out.items() if k in BWD_FACTOR
    )
    out["total"] = total_fwd + out["backward_extra"]
    out["uniform_2x_total"] = 2 * total_fwd  # old convention, for comparison
    return out


def step_compute(w: Workload, g: int, t: int) -> dict:
    """Per-device per-step FLOPs and HBM bytes (fwd + 2x bwd)."""
    it = w.itemsize
    # Cached-AtXt epoch: activation matmuls + edge readout gather.
    flops = w.T * w.N * w.F0 * w.F1 * 2  # AtXt @ W
    hbm = w.T * w.N * (w.F0 + w.F1) * it
    if w.two_layer:
        # layer-2 SpMM (gather floor: an (8,128)-tile fetch per nnz row)
        # + W2 matmul.
        flops += w.T * w.nnz * w.F1 * 2 + w.T * w.N * w.F1 * w.F1 * 2
        hbm += w.T * w.nnz * 8 * 128 * it / 8  # windowed kernel amortizes ~8x
    if w.family == "wdgcn":
        # Per-node LSTM over time: 4 gates x (2*F1 -> F1) per (t, n).
        flops += w.T * w.N * 4 * 2 * w.F1 * w.F1 * 2
        hbm += w.T * w.N * w.F1 * it  # hidden-state stream
    elif w.family == "evolvegcn":
        # GRU weight evolution is (F, k) x per-slice — negligible next
        # to the propagation; the per-slice einsum with slice-varying W
        # matches the generic AtXt term above.
        flops += w.T * 3 * 2 * w.F1 * w.F1 * w.F1 * 2
    flops += w.E * (4 * w.F1 * w.C)  # readout concat-matmul
    hbm += w.E * (2 * w.F1 + w.C) * it
    n_dev = g * t
    return {
        "flops_per_dev": 3 * flops / n_dev,  # fwd + ~2x bwd
        "hbm_bytes_per_dev": 3 * hbm / n_dev,
    }


def predict(w: Workload, g: int, t: int, transport: str = "ici") -> dict:
    """Efficiency prediction for one mesh shape."""
    comm = step_comm_bytes(w, g, t)
    comm_train = step_comm_bytes(w, g, t, train_only=True)
    comp = step_compute(w, g, t)
    bw = ICI_BW_LINK * ICI_AXES if transport == "ici" else DCN_BW
    t_comm = comm["total"] / bw
    t_comm_train = comm_train["total"] / bw
    t_comp = max(
        comp["flops_per_dev"] / (MXU_FLOPS if w.itemsize == 2 else MXU_FLOPS / 4),
        comp["hbm_bytes_per_dev"] / HBM_BW,
    )
    # Collectives on ICI overlap poorly with the tiny matmuls of these
    # models; assume NO overlap (pessimistic: serial sum).
    t_ideal = t_comp  # perfect scaling = compute only
    return {
        "mesh": f"{g}x{t}",
        "devices": g * t,
        "comm_bytes_per_dev": round(comm["total"]),
        "comm_bytes_per_dev_trainstep": round(comm_train["total"]),
        "comm_detail": {k: round(v) for k, v in comm.items() if k != "total"},
        "t_comm_us": round(t_comm * 1e6, 2),
        "t_comp_us": round(t_comp * 1e6, 2),
        "predicted_efficiency": round(t_ideal / (t_comp + t_comm), 4),
        # 99 of 100 epochs run the scalar-psum train step (eval_every).
        "predicted_efficiency_trainstep": round(
            t_ideal / (t_comp + t_comm_train), 4
        ),
    }


def mesh_shapes(n_dev: int) -> list[tuple[int, int]]:
    """(graph, time) factorizations of n_dev."""
    out = []
    for g in range(1, n_dev + 1):
        if n_dev % g == 0:
            out.append((g, n_dev // g))
    return out


def crossover(
    w: Workload, transport: str = "ici",
    key: str = "predicted_efficiency",
) -> dict | None:
    """Largest device count with predicted efficiency >= 0.8 (best mesh)."""
    best = None
    n = 1
    while n <= 4096:
        shapes = [
            predict(w, g, t, transport)
            for g, t in mesh_shapes(n)
            if t <= w.T and (w.family == "tmgcn" or t == 1)
        ]
        if not shapes:
            break
        top = max(shapes, key=lambda r: r[key])
        if top[key] >= 0.8:
            best = top
        else:
            break
        n *= 2
    return best


def table(out_path: str | None = None) -> dict:
    """The committed artifact: per-workload bytes + efficiency curves."""
    result = {"bandwidths": {
        "hbm_Bps": HBM_BW, "ici_Bps_per_link": ICI_BW_LINK,
        "ici_axes": ICI_AXES, "dcn_Bps": DCN_BW,
    }, "workloads": {}}
    for w in WORKLOADS:
        rows = []
        n = 2
        while n <= 64:
            for g, t in mesh_shapes(n):
                if t > w.T or (w.family != "tmgcn" and t != 1):
                    continue
                rows.append(predict(w, g, t))
            n *= 2
        entry = {
            "shape": dataclasses.asdict(w),
            "mesh_rows": rows,
            "ici_80pct_crossover": crossover(w, "ici"),
            "ici_80pct_crossover_trainstep": crossover(
                w, "ici", key="predicted_efficiency_trainstep"
            ),
            "dcn_80pct_crossover": crossover(w, "dcn"),
        }
        result["workloads"][w.name] = entry
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
    return result


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/comm_model.json")
    args = ap.parse_args()
    res = table(args.out)
    for name, entry in res["workloads"].items():
        xo = entry["ici_80pct_crossover"]
        print(f"{name}:")
        for r in entry["mesh_rows"][:8]:
            print(
                f"  mesh {r['mesh']:>6}  comm {r['comm_bytes_per_dev']:>12,} B "
                f" t_comm {r['t_comm_us']:>8} us  t_comp {r['t_comp_us']:>8} us "
                f" eff {r['predicted_efficiency']:.3f}"
            )
        print(f"  ICI >=80% up to: {xo['mesh'] if xo else 'n/a'} "
              f"({xo['devices'] if xo else 0} devices)")
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
