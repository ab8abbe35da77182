"""Temporal sparse tensor containers.

The central data structure of the framework: a T x N x N sparse tensor
holding one (typically normalized) adjacency matrix per time slice.

Design (TPU-first):
  * Static shapes everywhere. Every slice is padded to a common nonzero
    capacity so the whole tensor is three dense (T, P) arrays — rows,
    cols, vals — that batch cleanly under ``vmap``/``shard_map`` and never
    retrigger XLA compilation as the graph evolves.
  * Entries are sorted by (row, col) within each slice, so row-segment
    reductions are contiguous (``indices_are_sorted=True``) and therefore
    deterministic — no nondeterministic scatter-adds in the backward pass.
  * Padding entries use row = col = 0 with val = 0.0, which contribute
    nothing to any accumulation.
  * Constructors produce *host* (numpy) arrays: preprocessing never
    bounces through the accelerator (device transfers through a TPU
    tunnel are expensive). The container is a pytree, so
    ``jax.device_put`` moves it on-device once when it enters a model
    (the task adapters do this).

Capability reference: the per-slice ``torch.sparse.FloatTensor`` lists in
IBM/TM-GCN (e.g. TensorGCN-master/experiment_bitcoin_our.py:53-64 and
embedding_help_functions.py:560-572), re-designed as a single padded
structure-of-arrays.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["rows", "cols", "vals", "nnz"],
    meta_fields=["n_nodes"],
)
@dataclasses.dataclass(frozen=True)
class TemporalCOO:
    """A T x N x N temporal sparse tensor in padded, row-sorted COO form.

    Attributes:
        rows: (T, P) int32 — row index per entry; 0 on padding.
        cols: (T, P) int32 — col index per entry; 0 on padding.
        vals: (T, P) float — value per entry; 0.0 on padding.
        nnz:  (T,)   int32 — true nonzero count per slice.
        n_nodes: static int — N.
    """

    rows: jax.Array
    cols: jax.Array
    vals: jax.Array
    nnz: jax.Array
    n_nodes: int

    @property
    def n_slices(self) -> int:
        return self.rows.shape[0]

    @property
    def capacity(self) -> int:
        return self.rows.shape[1]

    @property
    def dtype(self):
        return self.vals.dtype

    # ------------------------------------------------------------------
    # Constructors
    # ------------------------------------------------------------------

    @staticmethod
    def from_slices(
        slices: Sequence[tuple[np.ndarray, np.ndarray, np.ndarray]],
        n_nodes: int,
        dtype=jnp.float32,
        pad_multiple: int = 128,
        capacity: int | None = None,
    ) -> "TemporalCOO":
        """Build from per-slice (rows, cols, vals) numpy triples.

        Duplicate (row, col) entries within a slice are summed (the analog
        of ``coalesce``). Entries are then sorted by (row, col).
        """
        T = len(slices)
        coalesced = []
        max_nnz = 1
        for r, c, v in slices:
            r = np.asarray(r, dtype=np.int64)
            c = np.asarray(c, dtype=np.int64)
            v = np.asarray(v, dtype=np.float64)
            if r.size:
                flat = r * n_nodes + c
                uniq, inv = np.unique(flat, return_inverse=True)
                acc = np.zeros(uniq.shape[0], dtype=np.float64)
                np.add.at(acc, inv, v)
                r, c, v = uniq // n_nodes, uniq % n_nodes, acc
            coalesced.append((r, c, v))
            max_nnz = max(max_nnz, r.size)

        P = capacity if capacity is not None else _round_up(max_nnz, pad_multiple)
        if P < max_nnz:
            raise ValueError(f"capacity {P} < max nnz {max_nnz}")

        rows = np.zeros((T, P), dtype=np.int32)
        cols = np.zeros((T, P), dtype=np.int32)
        vals = np.zeros((T, P), dtype=np.float64)
        nnz = np.zeros((T,), dtype=np.int32)
        for k, (r, c, v) in enumerate(coalesced):
            n = r.size
            rows[k, :n] = r
            cols[k, :n] = c
            vals[k, :n] = v
            nnz[k] = n

        return TemporalCOO(
            rows=rows,
            cols=cols,
            vals=vals.astype(dtype),
            nnz=nnz,
            n_nodes=int(n_nodes),
        )

    @staticmethod
    def from_global_coo(
        time_idx: np.ndarray,
        rows: np.ndarray,
        cols: np.ndarray,
        vals: np.ndarray,
        n_slices: int,
        n_nodes: int,
        dtype=jnp.float32,
        pad_multiple: int = 128,
        capacity: int | None = None,
    ) -> "TemporalCOO":
        """Build from global (t, i, j, v) coordinate lists."""
        time_idx = np.asarray(time_idx, dtype=np.int64)
        slices = []
        for k in range(n_slices):
            m = time_idx == k
            slices.append((np.asarray(rows)[m], np.asarray(cols)[m], np.asarray(vals)[m]))
        return TemporalCOO.from_slices(
            slices, n_nodes, dtype=dtype, pad_multiple=pad_multiple, capacity=capacity
        )

    @staticmethod
    def from_dense(dense: np.ndarray, dtype=jnp.float32, pad_multiple: int = 128) -> "TemporalCOO":
        """Build from a dense (T, N, N) array (testing / small graphs)."""
        dense = np.asarray(dense)
        T, N, _ = dense.shape
        slices = []
        for k in range(T):
            r, c = np.nonzero(dense[k])
            slices.append((r, c, dense[k][r, c]))
        return TemporalCOO.from_slices(slices, N, dtype=dtype, pad_multiple=pad_multiple)

    # ------------------------------------------------------------------
    # Views / conversions
    # ------------------------------------------------------------------

    def to_dense(self) -> jax.Array:
        """Materialize as a dense (T, N, N) array (testing / small N)."""

        def one(rows, cols, vals):
            out = jnp.zeros((self.n_nodes, self.n_nodes), dtype=self.vals.dtype)
            return out.at[rows, cols].add(vals)

        return jax.vmap(one)(self.rows, self.cols, self.vals)

    def transpose(self) -> "TemporalCOO":
        """Per-slice transpose (swap rows/cols), re-sorted by new rows.

        Host-side helper (numpy sort) — used when precomputing the adjoint
        operator for backward passes, not inside jit.
        """
        rows = np.asarray(self.rows)
        cols = np.asarray(self.cols)
        vals = np.asarray(self.vals)
        nnz = np.asarray(self.nnz)
        T, P = rows.shape
        new_rows = np.zeros_like(rows)
        new_cols = np.zeros_like(cols)
        new_vals = np.zeros_like(vals)
        for k in range(T):
            n = int(nnz[k])
            order = np.lexsort((rows[k, :n], cols[k, :n]))
            new_rows[k, :n] = cols[k, :n][order]
            new_cols[k, :n] = rows[k, :n][order]
            new_vals[k, :n] = vals[k, :n][order]
        return TemporalCOO(
            rows=new_rows,
            cols=new_cols,
            vals=new_vals,
            nnz=np.asarray(self.nnz),
            n_nodes=self.n_nodes,
        )

    def edge_list(self, with_values: bool = False):
        """Host-side (3, E) [slice, row, col] of all true nonzeros.

        Avoids any dense materialization or device round-trip; this is
        the fast path for extracting the labeled-edge set from an
        adjacency tensor.
        """
        rows = np.asarray(self.rows)
        cols = np.asarray(self.cols)
        vals = np.asarray(self.vals)
        nnz = np.asarray(self.nnz)
        parts, vparts = [], []
        for k in range(self.n_slices):
            n = int(nnz[k])
            parts.append(
                np.stack([np.full(n, k, dtype=np.int64), rows[k, :n], cols[k, :n]])
            )
            if with_values:
                vparts.append(vals[k, :n])
        edges = np.concatenate(parts, axis=1) if parts else np.zeros((3, 0), np.int64)
        if with_values:
            return edges, (np.concatenate(vparts) if vparts else np.zeros(0))
        return edges

    def slice_window(self, start: int, end: int) -> "TemporalCOO":
        """Select slices [start, end) along the time axis."""
        return TemporalCOO(
            rows=self.rows[start:end],
            cols=self.cols[start:end],
            vals=self.vals[start:end],
            nnz=self.nnz[start:end],
            n_nodes=self.n_nodes,
        )

    def astype(self, dtype) -> "TemporalCOO":
        return dataclasses.replace(self, vals=self.vals.astype(dtype))
