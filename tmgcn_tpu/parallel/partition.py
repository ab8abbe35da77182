"""Row partitioning of temporal sparse tensors across the graph axis.

Each graph shard owns a contiguous block of adjacency rows (nodes) for
every time slice. Entries are re-bucketed host-side into a (T, G, Pg)
layout — time-shardable on axis 0, graph-shardable on axis 1, padded to
a common per-shard capacity Pg — with *local* row indices and *global*
column indices: the local SpMM reduces into the shard's row block while
gathering from the (replicated or halo-exchanged) feature matrix.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import numpy as np

from tmgcn_tpu.core.sparse import TemporalCOO


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["rows", "cols", "vals", "nnz"],
    meta_fields=["n_nodes", "n_local_rows", "n_graph_shards"],
)
@dataclasses.dataclass(frozen=True)
class ShardedTemporalCOO:
    """Row-partitioned temporal COO: arrays of shape (T, G, Pg).

    rows are shard-local (in [0, n_local_rows)); cols are global.
    """

    rows: jax.Array
    cols: jax.Array
    vals: jax.Array
    nnz: jax.Array  # (T, G)
    n_nodes: int
    n_local_rows: int
    n_graph_shards: int

    @property
    def n_slices(self) -> int:
        return self.rows.shape[0]


def partition_rows(
    A: TemporalCOO, n_graph: int, pad_multiple: int = 128
) -> ShardedTemporalCOO:
    """Bucket entries by row block; returns host-side sharded arrays."""
    rows = np.asarray(A.rows)
    cols = np.asarray(A.cols)
    vals = np.asarray(A.vals)
    nnz = np.asarray(A.nnz)
    T = A.n_slices
    n_local = -(-A.n_nodes // n_graph)  # ceil

    buckets: list[list[tuple[np.ndarray, np.ndarray, np.ndarray]]] = [
        [None] * n_graph for _ in range(T)
    ]
    max_nnz = 1
    for k in range(T):
        n = int(nnz[k])
        r, c, v = rows[k, :n], cols[k, :n], vals[k, :n]
        shard = r // n_local
        for g in range(n_graph):
            m = shard == g
            buckets[k][g] = (r[m] - g * n_local, c[m], v[m])
            max_nnz = max(max_nnz, int(m.sum()))

    Pg = _round_up(max_nnz, pad_multiple)
    out_rows = np.zeros((T, n_graph, Pg), dtype=np.int32)
    out_cols = np.zeros((T, n_graph, Pg), dtype=np.int32)
    out_vals = np.zeros((T, n_graph, Pg), dtype=vals.dtype)
    out_nnz = np.zeros((T, n_graph), dtype=np.int32)
    for k in range(T):
        for g in range(n_graph):
            r, c, v = buckets[k][g]
            n = len(r)
            out_rows[k, g, :n] = r
            out_cols[k, g, :n] = c
            out_vals[k, g, :n] = v
            out_nnz[k, g] = n

    return ShardedTemporalCOO(
        rows=out_rows,
        cols=out_cols,
        vals=out_vals,
        nnz=out_nnz,
        n_nodes=A.n_nodes,
        n_local_rows=n_local,
        n_graph_shards=n_graph,
    )


def pad_time(A: ShardedTemporalCOO, n_time: int) -> ShardedTemporalCOO:
    """Pad the slice axis to a multiple of the time-mesh size."""
    T = A.n_slices
    Tp = _round_up(T, n_time)
    if Tp == T:
        return A
    pad = Tp - T

    def padz(x):
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), widths)

    return dataclasses.replace(
        A, rows=padz(A.rows), cols=padz(A.cols), vals=padz(A.vals), nnz=padz(A.nnz)
    )
