"""Pallas SpMM component breakdown + variant sweep on the real TPU.

Measures, at the RESULTS.md kernel shape (T=16, N=8192, ~1M nnz, F=128):

  * the XLA-gather vs kernel split (kernel-only timing on pre-gathered
    chunks vs the full operator),
  * f32-exact / fast / bf16-gather modes,
  * chunk/window size variants,

and reports Mnnz/s plus the roofline fraction from
``utils.profiling.spmm_cost`` (820 GB/s HBM on v5e).

    python tools/kernel_probe.py [--nnz 1048576] [--feat 128]

Writes results/kernel_probe.json.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

HBM_GBPS = 820.0  # v5e


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nnz", type=int, default=1 << 20)
    ap.add_argument("--feat", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/tmgcn_jax_cache")

    from tmgcn_tpu.core.sparse import TemporalCOO
    from tmgcn_tpu.kernels.spmm_pallas import make_operator, windowed_segment_matmul
    from tmgcn_tpu.utils.profiling import measure, spmm_cost, spmm_gather_bound

    T, N, F = 16, 8192, args.feat
    nnz_slice = args.nnz // T
    rng = np.random.default_rng(0)
    r = np.sort(rng.integers(0, N, (T, nnz_slice)), axis=1)
    c = rng.integers(0, N, (T, nnz_slice))
    t_idx = np.repeat(np.arange(T), nnz_slice)
    v = rng.standard_normal(T * nnz_slice).astype(np.float32)
    A = TemporalCOO.from_global_coo(
        t_idx, r.ravel(), c.ravel(), v, T, N, pad_multiple=128
    )
    nnz = int(np.asarray(A.nnz).sum())
    X = jax.device_put(
        jnp.asarray(rng.standard_normal((T, N, F)), jnp.float32)
    )
    cost = spmm_cost(nnz, T * N, F)
    floor_s = cost.hbm_bytes / (HBM_GBPS * 1e9)
    gbound_s = spmm_gather_bound(nnz)

    out = {
        "nnz": nnz,
        "T": T,
        "N": N,
        "F": F,
        "roofline_bytes": cost.hbm_bytes,
        "roofline_mnnz_per_s": round(nnz / floor_s / 1e6, 1),
        "gather_bound_mnnz_per_s": round(nnz / gbound_s / 1e6, 1),
        "variants": {},
    }

    def record(name, fn, *fn_args):
        dt = measure(jax.jit(fn), *fn_args, iters=args.iters)
        mnnz = nnz / dt / 1e6
        out["variants"][name] = {
            "ms": round(dt * 1e3, 3),
            "mnnz_per_s": round(mnnz, 1),
            "roofline_frac": round(dt and (floor_s / dt), 3),
            "gather_bound_frac": round(gbound_s / dt, 3),
        }
        print(
            f"{name:28s} {dt * 1e3:8.3f} ms  {mnnz:8.1f} Mnnz/s  "
            f"{100 * floor_s / dt:5.1f}% ideal  {100 * gbound_s / dt:5.1f}% "
            "gather-bound",
            flush=True,
        )

    variants = {
        "pallas_f32_256": dict(chunk=256, window=256),
        "pallas_fast_256": dict(chunk=256, window=256, fast=True),
        "pallas_bf16_256": dict(chunk=256, window=256, gather_dtype="bfloat16"),
        "pallas_bf16_512c": dict(chunk=512, window=256, gather_dtype="bfloat16"),
        "pallas_bf16_512w": dict(chunk=512, window=512, gather_dtype="bfloat16"),
        "pallas_f32_512c": dict(chunk=512, window=256),
        "pallas_bf16_w128": dict(chunk=512, window=128, gather_dtype="bfloat16"),
        "pallas_bf16_w128_sort": dict(
            chunk=512, window=128, gather_dtype="bfloat16", sort_cols=True
        ),
        "pallas_bf16_512c_sort": dict(
            chunk=512, window=256, gather_dtype="bfloat16", sort_cols=True
        ),
        "pallas_f32_sort": dict(chunk=512, window=256, sort_cols=True),
    }
    variants.update({
        "pallas_tiled_f32": dict(chunk=256, window=256, tile_dedup=True),
        "pallas_tiled_bf16": dict(
            chunk=256, window=256, tile_dedup=True, gather_dtype="bfloat16"
        ),
        "pallas_tiled_bf16_cap32": dict(
            chunk=256, window=256, tile_dedup=True, gather_dtype="bfloat16",
            ut_cap=32,
        ),
        "pallas_tiled_bf16_cap128": dict(
            chunk=256, window=256, tile_dedup=True, gather_dtype="bfloat16",
            ut_cap=128,
        ),
    })
    ops = {}
    for name, kw in variants.items():
        ops[name] = jax.device_put(make_operator(A, **kw))
        record(name, lambda op, x: op(x).sum(), ops[name], X)

    # Model predictions for the tiled-vs-plain decision at this shape.
    from tmgcn_tpu.kernels.spmm_pallas import PackedTiled, tiled_estimate
    from tmgcn_tpu.ops.spmm_rowsplit import flatten_stream as _flat

    g_r0, g_c0, _ = _flat(A)
    out["tiled_estimate_random"] = {
        k: (round(v, 4) if isinstance(v, float) else v)
        for k, v in tiled_estimate(
            g_r0, g_c0, chunk=256, window=256, feat=F, itemsize=2
        ).items()
    }

    # Component split on the canonical bf16 variant: kernel-only timing
    # on pre-gathered chunks (gather cost = full - kernel, approx).
    for name in ("pallas_f32_256", "pallas_bf16_256"):
        op = ops[name]
        packed = op.packed
        assert not isinstance(packed, PackedTiled)  # .cols below is PackedSpmm-only
        dtype = jnp.bfloat16 if op.gather_dtype else jnp.float32
        flat = X.reshape(T * N, F).astype(dtype)
        G = jax.device_put(
            flat[np.asarray(packed.cols).reshape(-1)].reshape(
                packed.n_chunks, packed.chunk, F
            )
        )
        prec = (
            jax.lax.Precision.DEFAULT
            if op.gather_dtype
            else jax.lax.Precision.HIGHEST
        )
        record(
            name + "_kernel_only",
            lambda g, p=packed, pr=prec: windowed_segment_matmul(
                p, g, pr, out_dtype=jnp.float32
            ).sum(),
            G,
        )
        # Gather alone (forced materialization via the kernel is the
        # full path; this times gather + a trivial reduce for reference).
        cols = jnp.asarray(np.asarray(packed.cols).reshape(-1))
        record(
            name + "_gather_only",
            lambda x, cc=cols, dt_=dtype: x.reshape(T * N, F)
            .astype(dt_)[cc]
            .sum(axis=0),
            X,
        )

    # Tiled component split: kernel-only on pre-gathered tile blocks vs
    # tiles-gather-only — locates whether the dedup's traffic saving is
    # eaten by the expand matmul (MXU) or never materializes (gather).
    from tmgcn_tpu.kernels.spmm_pallas import windowed_tiled_segment_matmul

    for name in ("pallas_tiled_bf16", "pallas_tiled_f32"):
        op = ops[name]
        packed = op.packed
        assert isinstance(packed, PackedTiled)
        dtype = jnp.bfloat16 if op.gather_dtype else jnp.float32
        flat = X.reshape(T * N, F).astype(dtype)
        pad = (-flat.shape[0]) % 64
        if pad:
            flat = jnp.pad(flat, ((0, pad), (0, 0)))
        J, U_t = packed.tiles.shape
        G = jax.device_put(
            np.asarray(flat.reshape(-1, 8 * F))[
                np.asarray(packed.tiles).reshape(-1)
            ].reshape(J, U_t * 8, F)
        )
        prec = (
            jax.lax.Precision.DEFAULT
            if op.gather_dtype
            else jax.lax.Precision.HIGHEST
        )
        record(
            name + "_kernel_only",
            lambda g, p=packed, pr=prec: windowed_tiled_segment_matmul(
                p, g, pr, out_dtype=jnp.float32
            ).sum(),
            G,
        )
        tiles_flat = jnp.asarray(np.asarray(packed.tiles).reshape(-1))
        record(
            name + "_gather_only",
            lambda x, tt=tiles_flat, dt_=dtype, p_=pad: jnp.pad(
                x.reshape(T * N, F).astype(dt_), ((0, p_), (0, 0))
            ).reshape(-1, 8 * F)[tt].sum(axis=0),
            X,
        )

    # --- Block-dense: structure-dependence demo. On the RANDOM graph
    # above nearly every nonzero owns a block, so the byte estimate
    # correctly rejects it; on a block-LOCAL graph of the same size
    # (what the real datasets look like — appearance-ordered ids,
    # banded M) the dense-tile operator passes the gather bound.
    from tmgcn_tpu.ops.spmm_blockdense import estimate
    from tmgcn_tpu.ops.spmm_blockdense import make_operator as make_bd
    from tmgcn_tpu.ops.spmm_rowsplit import flatten_stream

    g_r, g_c, _ = flatten_stream(A)
    out["blockdense_random_ratio"] = round(estimate(g_r, g_c)["ratio"], 2)
    print(f"blockdense byte ratio, random graph: "
          f"{out['blockdense_random_ratio']} (>= 0.5 -> refused)", flush=True)

    centers = rng.integers(0, N - 80, (T, nnz_slice // 24 + 1))
    pick = rng.integers(0, centers.shape[1], (T, nnz_slice))
    rc = np.clip(
        np.take_along_axis(centers, pick, 1) + rng.integers(-40, 40, (T, nnz_slice)),
        0, N - 1,
    )
    cc2 = np.clip(
        np.take_along_axis(centers, pick, 1) + rng.integers(-40, 40, (T, nnz_slice)),
        0, N - 1,
    )
    # Row-sort WITH the matching column permutation — sorting rows alone
    # would decorrelate the (row, col) pairs and destroy the very
    # block-locality this section demonstrates.
    o = np.argsort(rc, axis=1)
    rc = np.take_along_axis(rc, o, 1)
    cc2 = np.take_along_axis(cc2, o, 1)
    A2 = TemporalCOO.from_global_coo(
        t_idx, rc.ravel(), cc2.ravel(), v, T, N, pad_multiple=128
    )
    g_r2, g_c2, _ = flatten_stream(A2)
    out["clustered_nnz"] = int(np.asarray(A2.nnz).sum())  # Mnnz/s rows use `nnz`
    out["blockdense_clustered_ratio"] = round(estimate(g_r2, g_c2)["ratio"], 3)
    print(f"blockdense byte ratio, clustered graph: "
          f"{out['blockdense_clustered_ratio']}", flush=True)
    out["tiled_estimate_clustered"] = {
        k: (round(v, 4) if isinstance(v, float) else v)
        for k, v in tiled_estimate(
            g_r2, g_c2, chunk=256, window=256, feat=F, itemsize=2
        ).items()
    }
    for name, kw in {
        "clustered_pallas_bf16": None,
        "clustered_pallas_tiled_bf16": dict(
            chunk=256, window=256, tile_dedup=True, gather_dtype="bfloat16"
        ),
        "clustered_blockdense": dict(mode="exact"),
        "clustered_blockdense_bf16": dict(mode="bf16"),
    }.items():
        if kw is None:
            op2 = jax.device_put(make_operator(
                A2, chunk=512, window=256, gather_dtype="bfloat16", sort_cols=True
            ))
        elif "tile_dedup" in kw:
            op2 = jax.device_put(make_operator(A2, **kw))
        else:
            op2 = jax.device_put(make_bd(A2, **kw))
        record(name, lambda op, x: op(x).sum(), op2, X)

    (REPO / "results").mkdir(exist_ok=True)
    (REPO / "results/kernel_probe.json").write_text(json.dumps(out, indent=1))
    print("wrote results/kernel_probe.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
