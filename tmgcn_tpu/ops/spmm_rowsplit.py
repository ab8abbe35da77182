"""Row-split segmented SpMM: scatter-free-ish batched sparse matmul.

The flat gather/segment-sum SpMM (ops/spmm.py) is bottlenecked by XLA's
serialized scatter in ``segment_sum`` (~100 Mrows/s on TPU v5e). This
variant removes almost all of it with a two-level reduction:

  * Host-side, the row-sorted global nonzero stream is cut into
    *segments* of at most K entries that never span two output rows
    (``pack_rowsplit``). A row with d nonzeros produces ceil(d/K)
    segments; most rows of a graph adjacency produce exactly one.
  * On device, each segment reduces **densely**: gather its K feature
    rows, scale by the K values, sum over K — a static-shape
    (S, K, F) -> (S, F) contraction the VPU vectorizes perfectly.
  * Only the per-segment partials hit ``segment_sum``, cutting the
    serialized-scatter length by ~K (and to ~#rows when degrees <= K).

The backward needs dX = Aᵀ dY, whose naive autodiff transpose would be a
per-nonzero scatter again — so the operator carries the transposed
packing and runs the same forward kernel on it (``custom_vjp``), exactly
the strategy of the Pallas operator (kernels/spmm_pallas.py).

Capability reference: the ``for k in range(T): torch.sparse.mm`` loops of
IBM/TM-GCN (TensorGCN-master/embedding_help_functions.py:301-312) — this
is the TPU-native formulation of that hot op.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tmgcn_tpu.core.sparse import TemporalCOO

DEFAULT_K = 16


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["seg_rows", "cols", "vals"],
    meta_fields=["n_rows_out", "k"],
)
@dataclasses.dataclass(frozen=True)
class RowSplitPlan:
    """Host-packed segment plan.

    seg_rows: (S,) int32 — global output row of each segment (0 on
        padding segments, whose values are all zero).
    cols: (S, K) int32 — global gather rows (t*N + col; 0 on padding).
    vals: (S, K) float — nonzero values (0 on padding).
    n_rows_out: T*N (the flattened output length).
    k: segment width.
    """

    seg_rows: jax.Array
    cols: jax.Array
    vals: jax.Array
    n_rows_out: int
    k: int

    @property
    def n_segments(self) -> int:
        return self.seg_rows.shape[0]


def flatten_stream(A: TemporalCOO) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """A's true nonzeros as row-sorted global (t*N + r, t*N + c, v)."""
    rows_np = np.asarray(A.rows)
    cols_np = np.asarray(A.cols)
    vals_np = np.asarray(A.vals)
    nnz_np = np.asarray(A.nnz)
    T, N = A.n_slices, A.n_nodes
    parts_r, parts_c, parts_v = [], [], []
    for t in range(T):
        n = int(nnz_np[t])
        parts_r.append(rows_np[t, :n].astype(np.int64) + t * N)
        parts_c.append(cols_np[t, :n].astype(np.int64) + t * N)
        parts_v.append(vals_np[t, :n])
    g_rows = np.concatenate(parts_r) if parts_r else np.zeros(0, np.int64)
    g_cols = np.concatenate(parts_c) if parts_c else np.zeros(0, np.int64)
    g_vals = np.concatenate(parts_v) if parts_v else np.zeros(0, vals_np.dtype)
    return g_rows, g_cols, g_vals


def pack_rowsplit_stream(
    g_rows: np.ndarray,
    g_cols: np.ndarray,
    g_vals: np.ndarray,
    n_rows_out: int,
    k: int = DEFAULT_K,
    pad_multiple: int = 8,
) -> RowSplitPlan:
    """Cut a ROW-SORTED flat nonzero stream into K-entry segments."""
    P = len(g_rows)
    if P == 0:
        S = pad_multiple
        return RowSplitPlan(
            seg_rows=jnp.zeros(S, jnp.int32),
            cols=jnp.zeros((S, k), jnp.int32),
            vals=jnp.zeros((S, k), g_vals.dtype),
            n_rows_out=n_rows_out,
            k=k,
        )

    change = np.empty(P, bool)
    change[0] = True
    change[1:] = g_rows[1:] != g_rows[:-1]
    row_start = np.maximum.accumulate(np.where(change, np.arange(P), 0))
    pos = np.arange(P) - row_start
    seg_boundary = change | (pos % k == 0)
    seg_id = np.cumsum(seg_boundary) - 1
    within = pos % k
    S = int(seg_id[-1]) + 1
    S_pad = _round_up(S, pad_multiple)

    cols_pad = np.zeros((S_pad, k), np.int32)
    vals_pad = np.zeros((S_pad, k), g_vals.dtype)
    seg_rows = np.zeros(S_pad, np.int32)
    cols_pad[seg_id, within] = g_cols
    vals_pad[seg_id, within] = g_vals
    seg_rows[seg_id] = g_rows
    return RowSplitPlan(
        seg_rows=jnp.asarray(seg_rows),
        cols=jnp.asarray(cols_pad),
        vals=jnp.asarray(vals_pad),
        n_rows_out=n_rows_out,
        k=k,
    )


def pack_rowsplit(
    A: TemporalCOO, k: int = DEFAULT_K, pad_multiple: int = 8
) -> RowSplitPlan:
    """Cut A's row-sorted global nonzero stream into K-entry segments."""
    g_rows, g_cols, g_vals = flatten_stream(A)
    return pack_rowsplit_stream(
        g_rows, g_cols, g_vals, A.n_slices * A.n_nodes, k, pad_multiple
    )


def _apply_plan(plan: RowSplitPlan, flat: jax.Array) -> jax.Array:
    """(T*N, F) features -> (n_rows_out, F) segment-reduced product."""
    S, K = plan.cols.shape
    F = flat.shape[-1]
    g = flat[plan.cols.reshape(-1)].reshape(S, K, F)
    part = jnp.sum(g * plan.vals[:, :, None].astype(flat.dtype), axis=1)
    return jax.ops.segment_sum(
        part, plan.seg_rows, num_segments=plan.n_rows_out, indices_are_sorted=True
    )


def _fwd_impl(T, N, plan, X):
    F = X.shape[-1]
    return _apply_plan(plan, X.reshape(T * N, F)).reshape(T, N, F)


def _zero_cot(tree):
    def one(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.zeros_like(x)
        return np.zeros(x.shape, dtype=jax.dtypes.float0)

    return jax.tree.map(one, tree)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _spmm_rowsplit(T, N, plan, plan_t, X):
    return _fwd_impl(T, N, plan, X)


def _spmm_rowsplit_fwd(T, N, plan, plan_t, X):
    return _fwd_impl(T, N, plan, X), (plan, plan_t)


def _spmm_rowsplit_bwd(T, N, res, dY):
    plan, plan_t = res
    dX = _fwd_impl(T, N, plan_t, dY)  # dX = Aᵀ dY
    return _zero_cot(plan), _zero_cot(plan_t), dX


_spmm_rowsplit.defvjp(_spmm_rowsplit_fwd, _spmm_rowsplit_bwd)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["plan", "plan_t"],
    meta_fields=["T", "N"],
)
@dataclasses.dataclass(frozen=True)
class RowSplitSpmmOperator:
    """Prepacked row-split SpMM operator: call on (T, N, F) features."""

    T: int
    N: int
    plan: RowSplitPlan
    plan_t: RowSplitPlan

    @property
    def n_slices(self) -> int:
        return self.T

    @property
    def n_nodes(self) -> int:
        return self.N

    def __call__(self, X: jax.Array) -> jax.Array:
        return _spmm_rowsplit(self.T, self.N, self.plan, self.plan_t, X)


def make_operator(A: TemporalCOO, k: int = DEFAULT_K) -> RowSplitSpmmOperator:
    """Prepack forward + transpose segment plans for A (host-side)."""
    return RowSplitSpmmOperator(
        T=A.n_slices,
        N=A.n_nodes,
        plan=pack_rowsplit(A, k),
        plan_t=pack_rowsplit(A.transpose(), k),
    )


# ---------------------------------------------------------------------------
# Rectangular (flat) operator: arbitrary (n_out x n_in) sparse matrix over
# flattened index spaces. Used for readout-restricted propagation, where
# only the output rows a later gather actually reads are computed.
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _flat_spmm(n_in, n_out, plan, plan_t, X_flat):
    return _apply_plan(plan, X_flat)


def _flat_spmm_fwd(n_in, n_out, plan, plan_t, X_flat):
    return _apply_plan(plan, X_flat), (plan, plan_t)


def _flat_spmm_bwd(n_in, n_out, res, dY):
    plan, plan_t = res
    return _zero_cot(plan), _zero_cot(plan_t), _apply_plan(plan_t, dY)


_flat_spmm.defvjp(_flat_spmm_fwd, _flat_spmm_bwd)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["plan", "plan_t"],
    meta_fields=["n_in", "n_out"],
)
@dataclasses.dataclass(frozen=True)
class FlatRowSplitOperator:
    """(n_out x n_in) sparse operator: (n_in, F) -> (n_out, F)."""

    n_in: int
    n_out: int
    plan: RowSplitPlan
    plan_t: RowSplitPlan

    def __call__(self, X_flat: jax.Array) -> jax.Array:
        return _flat_spmm(self.n_in, self.n_out, self.plan, self.plan_t, X_flat)


def make_flat_operator(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    n_in: int,
    n_out: int,
    k: int = DEFAULT_K,
) -> FlatRowSplitOperator:
    """Build a rectangular operator from (row, col, val) triples.

    Entries need not be pre-sorted; both the forward (row-sorted) and
    transposed (col-sorted) segment plans are packed host-side.
    """
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    vals = np.asarray(vals)
    order = np.lexsort((cols, rows))
    plan = pack_rowsplit_stream(rows[order], cols[order], vals[order], n_out, k)
    order_t = np.lexsort((rows, cols))
    plan_t = pack_rowsplit_stream(
        cols[order_t], rows[order_t], vals[order_t], n_in, k
    )
    return FlatRowSplitOperator(n_in=n_in, n_out=n_out, plan=plan, plan_t=plan_t)
