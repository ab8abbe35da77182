"""SpMM implementation microbenchmark: rate + roofline fraction per impl.

    python -m tmgcn_tpu.utils.spmm_bench [--quick] [--fwd-only]

Benchmarks the SpMM implementations (flat jnp gather/segment-sum,
row-split segmented, Pallas windowed one-hot) on (a) the round-1
comparison shape (1M nnz, N=8192, F=128) and (b) the chess layer-2
shape (T=79, N=7301, ~20k nnz/slice, F=8), printing Mnnz/s and the
fraction of the bandwidth/compute roofline (utils/profiling.spmm_cost)
for each. Gather-only / segment-sum-only diagnostics isolate where the
time goes.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def make_workload(T, N, nnz_per_slice, F, seed=0):
    import jax.numpy as jnp

    from tmgcn_tpu.core.sparse import TemporalCOO

    rng = np.random.default_rng(seed)
    slices = []
    for _ in range(T):
        r = rng.integers(0, N, nnz_per_slice)
        c = rng.integers(0, N, nnz_per_slice)
        v = rng.random(nnz_per_slice)
        slices.append((r, c, v))
    A = TemporalCOO.from_slices(slices, N, dtype=jnp.float32)
    X = jnp.asarray(rng.standard_normal((T, N, F)), jnp.float32)
    return A, X


def bench_case(name, A, X, fwd_only=False, quick=False, iters=20):
    import jax
    import jax.numpy as jnp

    from tmgcn_tpu.kernels import spmm_pallas
    from tmgcn_tpu.ops import spmm_rowsplit
    from tmgcn_tpu.ops.spmm import spmm
    from tmgcn_tpu.utils.profiling import measure, spmm_cost

    nnz = int(np.asarray(A.nnz).sum())
    T, N, F = X.shape[0], A.n_nodes, X.shape[-1]
    cost = spmm_cost(nnz, T * N, F)
    G = jnp.asarray(
        np.random.default_rng(1).standard_normal(X.shape), jnp.float32
    )

    results = []

    def run(tag, fn, *args):
        jfn = jax.jit(fn)
        dt = measure(jfn, *args, iters=iters)
        rec = {
            "case": name,
            "impl": tag,
            "mnnz_per_s": round(nnz / dt / 1e6, 1),
            "ms": round(dt * 1e3, 3),
            "roofline_frac": round(cost.roofline_fraction(dt), 3),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # Diagnostics: where does the time go?
    flat_cols = (
        np.concatenate(
            [
                np.asarray(A.cols)[t, : np.asarray(A.nnz)[t]] + t * N
                for t in range(T)
            ]
        )
    ).astype(np.int32)
    cols_dev = jnp.asarray(flat_cols)
    run("gather_only", lambda c, x: x.reshape(T * N, F)[c].sum(axis=0), cols_dev, X)

    run("jnp_flat", lambda a, x: spmm(a, x).sum(), A, X)

    ks = (16,) if quick else (8, 16, 32, 64)
    for k in ks:
        op = spmm_rowsplit.make_operator(A, k=k)
        run(f"rowsplit_k{k}", lambda o, x: o(x).sum(), op, X)
        if not fwd_only:
            run(
                f"rowsplit_k{k}_fwdbwd",
                lambda o, x: jax.grad(lambda xx: jnp.vdot(o(xx), G))(x).sum(),
                op,
                X,
            )

    pallas_cfgs = [(256, 256)] if quick else [(256, 256), (512, 256), (1024, 256), (512, 512), (1024, 512)]
    for chunk, window in pallas_cfgs:
        for fast in ((False,) if quick else (False, True)):
            try:
                op = spmm_pallas.make_operator(A, chunk=chunk, window=window, fast=fast)
                tag = f"pallas_c{chunk}_w{window}" + ("_fast" if fast else "")
                run(tag, lambda o, x: o(x).sum(), op, X)
                if not fwd_only and chunk == 256 and window == 256 and not fast:
                    run(
                        tag + "_fwdbwd",
                        lambda o, x: jax.grad(lambda xx: jnp.vdot(o(xx), G))(x).sum(),
                        op,
                        X,
                    )
            except Exception as e:  # Mosaic compile failures on some cfgs
                print(json.dumps({"case": name, "impl": f"pallas_c{chunk}_w{window}", "error": str(e)[:200]}), flush=True)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--case", choices=["r1", "chess2", "all"], default="all")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/tmgcn_jax_cache")
    print(json.dumps({"backend": jax.default_backend(), "devices": len(jax.devices())}))

    out = []
    if args.case in ("r1", "all"):
        A, X = make_workload(T=16, N=8192, nnz_per_slice=62_500, F=128)
        out += bench_case("r1_1Mnnz_F128", A, X, args.fwd_only, args.quick)
    if args.case in ("chess2", "all"):
        A, X = make_workload(T=79, N=7301, nnz_per_slice=20_000, F=8)
        out += bench_case("chess2_F8", A, X, args.fwd_only, args.quick)
    return out


if __name__ == "__main__":
    main()
