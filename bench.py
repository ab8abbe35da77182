"""Benchmark: TM-GCN training throughput on the chess dataset.

Measures the steady-state full-batch training epoch of TM-GCN 1-layer
edge classification on the in-repo chess dataset (80 train slices,
N=7301, ~50k labeled edges, reference protocol incl. per-epoch
confusion counts), and compares against a reference-equivalent PyTorch
CPU implementation of the same epoch (the reference framework is
CPU-only: its training epoch is cached-AtXt matmul + edge gather + CE
backward + SGD, embedding_help_functions.py:210-234 — reimplemented
here from that spec, not copied).

Prints ONE JSON line:
    {"metric": "chess_tmgcn_train_edges_per_s", "value": ...,
     "unit": "edges/s", "vs_baseline": ours / torch_cpu_reference}
"""

from __future__ import annotations

import json
import sys
import time
import warnings

import numpy as np

warnings.filterwarnings("ignore", message=".*[Ss]parse.*")

N_TIMED = 400
N_WARMUP = 3
N_TORCH = 10


def prepare():
    from tmgcn_tpu.configs.build import build_data
    from tmgcn_tpu.configs.presets import get_preset
    from tmgcn_tpu.tasks.windows import split_edges_classification

    cfg = get_preset("chess_tmgcn_cls")
    data = build_data(cfg, data_dir="data/chess")
    splits = split_edges_classification(
        data.edge_index, data.edge_values, data.spec, n_classes=3
    )
    return cfg, data, splits


def bench_ours(cfg, data, splits, spmm_impl="jnp") -> tuple[float, int]:
    """Returns (epoch_seconds, n_train_edges)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    from tmgcn_tpu.configs.build import build_model
    from tmgcn_tpu.tasks.adapters import make_edge_adapter
    from tmgcn_tpu.train.losses import weighted_cross_entropy

    cfg = dataclasses.replace(cfg, spmm_impl=spmm_impl)
    model = build_model(cfg, data.spec.s_train, data.feats["train"].shape[-1])
    adapter = make_edge_adapter(
        model,
        data.adj,
        data.feats,
        {w: splits[w].edges for w in ("train", "val", "test")},
        M=data.M,
    )
    variables = adapter.init(jax.random.PRNGKey(0))
    params, buffers = variables["params"], variables["buffers"]
    tgt = jnp.asarray(splits["train"].target)
    cw = jnp.asarray(np.array([1 / 3, 1 / 3, 1 / 3], dtype=np.float32))
    opt = optax.sgd(cfg.lr, momentum=cfg.momentum)
    opt_state = opt.init(params)

    from functools import partial

    @partial(jax.jit, static_argnames="n_steps")
    def train_chunk(params, opt_state, bundle, tgt, n_steps):
        def body(carry, _):
            params, opt_state = carry

            def loss_fn(p):
                out, _ = adapter.apply({"params": p, "buffers": buffers}, bundle, ())
                return weighted_cross_entropy(out, tgt, cw), out

            (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = opt.update(grads, opt_state)
            # Per-epoch confusion counts, as the reference protocol reads.
            guess = jnp.argmax(out, axis=1)
            tp = jnp.sum((guess == 0) & (tgt == 0))
            fp = jnp.sum((guess == 0) & (tgt != 0))
            fn = jnp.sum((guess != 0) & (tgt == 0))
            return (optax.apply_updates(params, updates), opt_state), (loss, tp, fp, fn)

        (params, opt_state), aux = jax.lax.scan(
            body, (params, opt_state), None, length=n_steps
        )
        return params, opt_state, aux

    bundle = adapter.bundles["train"]
    params, opt_state, aux = train_chunk(params, opt_state, bundle, tgt, N_TIMED)
    jax.block_until_ready(aux)  # warmup + compile

    t0 = time.perf_counter()
    params, opt_state, aux = train_chunk(params, opt_state, bundle, tgt, N_TIMED)
    _ = np.asarray(aux[0]), np.asarray(aux[1])
    dt = (time.perf_counter() - t0) / N_TIMED
    return dt, int(splits["train"].target.shape[0])


def bench_torch_reference(data, splits) -> float:
    """Reference-equivalent training epoch in PyTorch on CPU."""
    import torch as t

    T = data.spec.s_train
    Ct = data.adj["train"]
    N = Ct.n_nodes
    X = t.tensor(np.asarray(data.feats["train"]), dtype=t.float64)
    M = t.tensor(np.asarray(data.M), dtype=t.float64)

    # Cached AtXt exactly as the reference computes it at model init.
    rows = np.asarray(Ct.rows)
    cols = np.asarray(Ct.cols)
    vals = np.asarray(Ct.vals, dtype=np.float64)
    nnz = np.asarray(Ct.nnz)
    Xt = t.matmul(M, X.reshape(T, -1)).reshape(X.size())
    AtXt = t.zeros(T, N, X.shape[-1], dtype=t.float64)
    for k in range(T):
        n = int(nnz[k])
        idx = t.tensor(np.stack([rows[k, :n], cols[k, :n]]), dtype=t.long)
        a = t.sparse_coo_tensor(idx, t.tensor(vals[k, :n]), (N, N))
        AtXt[k] = t.sparse.mm(a, Xt[k])

    edges = t.tensor(splits["train"].edges, dtype=t.long)
    target = t.tensor(splits["train"].target, dtype=t.long)
    src = edges[0] * N + edges[1]
    trg = edges[0] * N + edges[2]

    W = t.randn(X.shape[-1], 6, dtype=t.float64, requires_grad=True)
    U = t.randn(12, 3, dtype=t.float64, requires_grad=True)
    opt = t.optim.SGD([W, U], lr=0.01, momentum=0.9)
    crit = t.nn.CrossEntropyLoss(
        weight=t.tensor([1 / 3, 1 / 3, 1 / 3], dtype=t.float64)
    )

    def epoch():
        opt.zero_grad()
        Y = t.matmul(AtXt, W).reshape(-1, 6)
        out = t.cat((Y[src], Y[trg]), dim=1) @ U
        loss = crit(out, target)
        loss.backward()
        opt.step()
        with t.no_grad():
            guess = t.argmax(out, dim=1)
            _ = (
                t.sum((guess == 0) & (target == 0)),
                t.sum((guess == 0) & (target != 0)),
                t.sum((guess != 0) & (target == 0)),
            )

    epoch()  # warmup
    # Best of 3 rounds: the host CPU is shared, and a loaded machine
    # would otherwise understate the reference's throughput.
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(N_TORCH):
            epoch()
        best = min(best, (time.perf_counter() - t0) / N_TORCH)
    return best


def main() -> int:
    cfg, data, splits = prepare()
    ours_jnp, n_edges = bench_ours(cfg, data, splits, "jnp")
    ours_pallas, _ = bench_ours(cfg, data, splits, "pallas")
    ours_s = min(ours_jnp, ours_pallas)
    print(
        f"# xla-path {ours_jnp * 1e3:.2f} ms/epoch | pallas-path "
        f"{ours_pallas * 1e3:.2f} ms/epoch",
        file=sys.stderr,
    )
    ref_s = bench_torch_reference(data, splits)
    edges_per_s = n_edges / ours_s
    ref_edges_per_s = n_edges / ref_s
    print(
        json.dumps(
            {
                "metric": "chess_tmgcn_train_edges_per_s",
                "value": round(edges_per_s),
                "unit": "edges/s",
                "vs_baseline": round(edges_per_s / ref_edges_per_s, 3),
            }
        )
    )
    print(
        f"# ours: {ours_s * 1e3:.2f} ms/epoch | torch-cpu reference: "
        f"{ref_s * 1e3:.2f} ms/epoch | {n_edges} train edges",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
