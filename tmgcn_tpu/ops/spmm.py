"""Batched sparse-times-dense matmul over the temporal axis.

``spmm(A, X)`` computes ``Y[k] = A[k] @ X[k]`` for every time slice k of a
:class:`TemporalCOO` tensor — the hot op of every model in the framework
(capability reference: the ``for k in range(T): torch.sparse.mm`` loops in
IBM/TM-GCN, e.g. TensorGCN-master/embedding_help_functions.py:203-208).

TPU-first design: instead of a Python loop over slices, all T slices run
as one batched gather / segment-sum with static shapes:

    Y[k] = segment_sum(vals[k, :, None] * X[k, cols[k]], rows[k])

Entries are row-sorted (see ``TemporalCOO``), so the segment reduction is
contiguous and deterministic, and its autodiff transpose (the backward
``A^T dY``) is a gather + scatter-add with the same static shapes.

An optional Pallas path (``tmgcn_tpu.kernels``) implements the same
contract with explicit VMEM tiling for large graphs; ``spmm`` dispatches
on the ``impl`` argument so models stay implementation-agnostic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tmgcn_tpu.core.sparse import TemporalCOO


def spmm_slice(
    rows: jax.Array,
    cols: jax.Array,
    vals: jax.Array,
    x: jax.Array,
    n_nodes: int,
) -> jax.Array:
    """One-slice SpMM: (P,) coo arrays x (N, F) dense -> (N, F)."""
    gathered = x[cols] * vals[:, None].astype(x.dtype)
    return jax.ops.segment_sum(
        gathered, rows, num_segments=n_nodes, indices_are_sorted=True
    )


def spmm(A: TemporalCOO, X: jax.Array, impl: str = "jnp") -> jax.Array:
    """Batched per-slice SpMM: Y[k] = A[k] @ X[k].

    Args:
        A: temporal sparse tensor, T slices of N x N.
        X: dense (T, N, F) features.
        impl: "jnp" (gather/segment-sum) or "pallas" (TPU kernel).

    Returns:
        (T, N, F) dense result, dtype of X.
    """
    if not isinstance(A, TemporalCOO):
        # A prepacked operator (e.g. kernels.spmm_pallas.PallasSpmmOperator):
        # models are agnostic to which implementation their adjacency
        # carries; adapters decide at build time.
        return A(X)
    if impl in ("pallas", "pallas_bf16"):
        from tmgcn_tpu.kernels.spmm_pallas import make_operator, spmm_pallas

        if impl == "pallas":
            return spmm_pallas(A, X)
        if isinstance(A.rows, jax.core.Tracer):
            raise ValueError(
                "spmm(impl='pallas_bf16') needs host-side packing; build "
                "an operator with make_operator(A, ...) outside jit"
            )
        return make_operator(
            A, chunk=512, window=256, gather_dtype="bfloat16", sort_cols=True
        )(X)
    if impl in ("pallas_tiled", "pallas_tiled_bf16"):
        from tmgcn_tpu.kernels.spmm_pallas import make_operator

        if isinstance(A.rows, jax.core.Tracer):
            raise ValueError(
                "spmm(impl='pallas_tiled') needs host-side packing; build "
                "an operator with make_operator(A, tile_dedup=True) outside jit"
            )
        return make_operator(
            A, chunk=512, window=256, tile_dedup=True,
            gather_dtype="bfloat16" if impl.endswith("bf16") else None,
        )(X)
    if impl == "rowsplit":
        from tmgcn_tpu.ops.spmm_rowsplit import make_operator

        if isinstance(A.rows, jax.core.Tracer):
            raise ValueError(
                "spmm(impl='rowsplit') needs host-side packing; build a "
                "RowSplitSpmmOperator with make_operator(A) outside jit"
            )
        return make_operator(A)(X)
    if impl in ("blockdense", "blockdense_bf16"):
        from tmgcn_tpu.ops.spmm_blockdense import make_operator

        if isinstance(A.rows, jax.core.Tracer):
            raise ValueError(
                "spmm(impl='blockdense') needs host-side packing; build a "
                "TemporalBlockDenseOperator with make_operator(A) outside jit"
            )
        return make_operator(
            A, mode="bf16" if impl.endswith("bf16") else "exact"
        )(X)
    if impl != "jnp":
        raise ValueError(f"unknown spmm impl: {impl!r}")
    # Flatten the (T, P) batch into one global gather + segment reduction:
    # XLA lowers a single large gather/scatter far better than a vmapped
    # per-slice one (measured ~6x on TPU v5e). Global row ids t*N + row
    # keep the per-slice segments disjoint and sorted.
    T, P = A.rows.shape
    N = A.n_nodes
    F = X.shape[-1]
    offsets = (jnp.arange(T, dtype=A.rows.dtype) * N)[:, None]
    flat_rows = (A.rows + offsets).reshape(T * P)
    flat_cols = (A.cols + offsets).reshape(T * P)
    flat_vals = A.vals.reshape(T * P)
    gathered = X.reshape(T * N, F)[flat_cols] * flat_vals[:, None].astype(X.dtype)
    out = jax.ops.segment_sum(
        gathered, flat_rows, num_segments=T * N, indices_are_sorted=True
    )
    return out.reshape(T, N, F)


def make_auto_operator(A: TemporalCOO, bf16: bool = False, feat: int = 128):
    """Build-time operator auto-selection for the FULL-ROW path.

    Picks the cheapest prepacked operator for ``A`` by the byte model:
    on TPU, the block-dense operator when its dense block tensor moves
    LESS THAN HALF the bytes of the Pallas kernel's tile-gather floor —
    the 0.5 margin (not the break-even 1.0) absorbs the block path's
    costs the byte model ignores (windowed one-hot metadata streams and
    boundary transposes), matching the measured crossover on chess-like
    patterns. Ordering is appearance-ordered ids (measured best — RCM /
    degree / activity clusterings all RAISE the block count, see
    tools/blockdense_ordering.py). Otherwise, among the gather-family
    Pallas kernels: the tile-dedup variant when
    ``kernels.spmm_pallas.tiled_estimate`` (constants calibrated
    against tools/kernel_probe.py measurements) models it at under
    0.6x the plain kernel's time and HBM-bound — under the calibration
    NO measured pattern satisfies this (the gather is per-row-ISSUE-
    bound, so tiled's byte saving doesn't pay, and the expand matmul +
    extra chunks raise kernel time: tiled measured 0.42x plain at
    F=128 random, 0.69x clustered; results/tiled_analysis.md), so in
    practice this picks the plain windowed kernel; the rule stays so a
    future genuinely dedup-friendly pattern would switch
    automatically. Off-TPU the input is returned unpacked (the
    gather/segment-sum path is native XLA on CPU).

    ``bf16=True`` selects the production-fast precision class (bf16
    block tensor / bf16 gather traffic, f32 accumulation); the default
    keeps exact f32 semantics. The block-vs-gather byte RATIO is
    itemsize-invariant (both paths scale together), so one threshold
    serves both classes. Both fallback kernels use sort_cols=True —
    column sorting only reorders gathers for locality, never the
    accumulation order, so exact semantics are preserved. ``feat`` is
    the feature width the operator will be applied at (the tiled flop
    model needs it; plain/block selection is F-independent). Replaces
    the reference's per-epoch ``for t: torch.sparse.mm`` loop at its
    own full-row computation shape (embedding_help_functions.py:301-312).
    """
    if jax.default_backend() != "tpu":
        return A
    from tmgcn_tpu.ops.spmm_blockdense import estimate
    from tmgcn_tpu.ops.spmm_rowsplit import flatten_stream

    g_rows, g_cols, _ = flatten_stream(A)
    if estimate(g_rows, g_cols, itemsize=2 if bf16 else 4)["ratio"] < 0.5:
        from tmgcn_tpu.ops.spmm_blockdense import make_operator

        try:
            return make_operator(A, mode="bf16" if bf16 else "exact")
        except ValueError:
            pass  # over the block byte budget -> Pallas below
    from tmgcn_tpu.kernels.spmm_pallas import make_operator, tiled_estimate

    est = tiled_estimate(
        g_rows, g_cols, chunk=512, window=256, feat=feat,
        itemsize=2 if bf16 else 4,
    )
    if est["ratio"] < 0.6 and est["tiled_bound"] == "hbm":
        return make_operator(
            A, chunk=512, window=256,
            gather_dtype="bfloat16" if bf16 else None, tile_dedup=True,
        )
    return make_operator(
        A, chunk=512, window=256,
        gather_dtype="bfloat16" if bf16 else None, sort_cols=True,
    )


def spmm_dense_reference(A_dense: jax.Array, X: jax.Array) -> jax.Array:
    """Dense oracle for tests: einsum over materialized (T, N, N)."""
    return jnp.einsum("tij,tjf->tif", A_dense, X)
