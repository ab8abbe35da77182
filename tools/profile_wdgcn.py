"""Where do WD-GCN's 6.24 ms/epoch go? (VERDICT round-3 #8)

Times each component of the chess WD-GCN cls epoch on the real device:
the LSTM scan (fwd and fwd+bwd, across unroll factors), the hoisted
input-gate einsum, the edge readout, and the full training step — then
prints the per-step recurrence overhead and the implied floor.

    python tools/profile_wdgcn.py [--out results/wdgcn_profile.json]

Timing convention: force a device-side scalar reduction and fetch it —
block_until_ready does not block through the axon tunnel (CLAUDE.md).
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


def timed(fn, *args, iters=30, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        float(out.sum() if hasattr(out, "sum") else out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out.sum() if hasattr(out, "sum") else out)
    return (time.perf_counter() - t0) / iters


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/wdgcn_profile.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from tmgcn_tpu.configs.build import build_data, build_model
    from tmgcn_tpu.configs.presets import get_preset
    from tmgcn_tpu.models.wdgcn import lstm_scan
    from tmgcn_tpu.tasks.adapters import make_edge_adapter
    from tmgcn_tpu.tasks.windows import split_edges_classification
    from tmgcn_tpu.train.losses import weighted_cross_entropy

    cfg = get_preset("chess_wdgcn_cls")
    data = build_data(cfg, data_dir="data/chess")
    splits = split_edges_classification(
        data.edge_index, data.edge_values, data.spec, n_classes=3
    )
    model = build_model(cfg, data.spec.s_train, data.feats["train"].shape[-1])
    adapter = make_edge_adapter(
        model, data.adj, data.feats,
        {w: splits[w].edges for w in ("train", "val", "test")}, M=None,
    )
    variables = adapter.init(jax.random.PRNGKey(0))
    params, buffers = variables["params"], variables["buffers"]
    bundle = adapter.bundles["train"]
    tgt = jnp.asarray(splits["train"].target)
    cw = jnp.asarray(np.array([1 / 3] * 3), jnp.float32)
    T, N = data.spec.s_train, data.adj["train"].n_nodes
    F1 = cfg.hidden_feat[0]
    res: dict = {"T": T, "N": N, "F1": F1}

    # --- full training step (what model_bench measures) ---
    opt = optax.sgd(cfg.lr, momentum=cfg.momentum)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(p, s):
        def loss_fn(pp):
            with jax.default_matmul_precision("highest"):
                out, _ = adapter.apply({"params": pp, "buffers": buffers}, bundle, ())
            return weighted_cross_entropy(out, tgt, cw)

        loss, g = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, loss

    def step_once():
        nonlocal params, opt_state
        params, opt_state, loss = train_step(params, opt_state)
        return loss

    res["train_step_ms"] = timed(step_once, iters=50) * 1e3

    # --- forward only ---
    @jax.jit
    def fwd(p):
        with jax.default_matmul_precision("highest"):
            out, _ = adapter.apply({"params": p, "buffers": buffers}, bundle, ())
        return out

    res["forward_ms"] = timed(fwd, params, iters=50) * 1e3

    # --- LSTM scan in isolation, fwd and fwd+bwd, per unroll ---
    rng = np.random.default_rng(0)
    Y = jnp.asarray(rng.standard_normal((T, N, F1)).astype(np.float32))
    lp = params["lstm"]
    h0, c0 = buffers["h_init"], buffers["c_init"]
    for unroll in (1, 8, 16, 40, 80):
        f = jax.jit(lambda p, y, u=unroll: lstm_scan(p, h0, c0, y, unroll=u))
        res[f"scan_fwd_u{unroll}_ms"] = timed(f, lp, Y) * 1e3

        g = jax.jit(
            lambda p, y, u=unroll: jax.grad(
                lambda pp: lstm_scan(pp, h0, c0, y, unroll=u).sum()
            )(p)["Uf"]
        )
        res[f"scan_fwdbwd_u{unroll}_ms"] = timed(g, lp, Y) * 1e3

    # --- hoisted input-gate einsum alone ---
    @jax.jit
    def pre_stack(p, y):
        return jnp.stack(
            [
                jnp.einsum("fk,tnf->tkn", p[f"W{g}"], y) + p[f"b{g}"][:, None]
                for g in "fjoc"
            ],
            axis=1,
        )

    res["pre_stack_ms"] = timed(pre_stack, lp, Y) * 1e3

    # --- per-step overhead model: scan time vs T ---
    for Tsub in (20, 40):
        Ysub = Y[:Tsub]
        f = jax.jit(lambda p, y: lstm_scan(p, h0, c0, y, unroll=8))
        res[f"scan_fwd_T{Tsub}_ms"] = timed(f, lp, Ysub) * 1e3

    for k, v in res.items():
        if isinstance(v, float):
            print(f"{k:24s} {v:8.3f} ms")
        else:
            print(f"{k:24s} {v}")
    Path(args.out).write_text(json.dumps(res, indent=1))
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
