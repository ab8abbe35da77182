"""Degree-based node features.

Capability reference: IBM/TM-GCN builds each node's 2-feature signal as
[in-degree, out-degree] per slice via ``t.sparse.sum(A, 1/2)`` (e.g.
TensorGCN-master/embedding_help_functions.py:597-609). Here both sums run
as batched segment reductions over the padded COO arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tmgcn_tpu.core.sparse import TemporalCOO


def degree_features(A: TemporalCOO, dtype=jnp.float32) -> jax.Array:
    """(T, N, 2) features: [:, :, 0] = column sums, [:, :, 1] = row sums.

    Column sums match ``t.sparse.sum(A, 1)`` (sum over row index i, i.e.
    in-degree of node j); row sums match ``t.sparse.sum(A, 2)``.
    """
    N = A.n_nodes

    def one(rows, cols, vals):
        col_sum = jax.ops.segment_sum(vals, cols, num_segments=N)
        row_sum = jax.ops.segment_sum(vals, rows, num_segments=N, indices_are_sorted=True)
        return jnp.stack([col_sum, row_sum], axis=-1)

    return jax.vmap(one)(A.rows, A.cols, A.vals).astype(dtype)


def degree_features_np(A: TemporalCOO) -> np.ndarray:
    """Host-side (numpy) variant for data preparation.

    Avoids device round-trips during preprocessing — important when the
    accelerator sits behind a network tunnel.
    """
    rows = np.asarray(A.rows)
    cols = np.asarray(A.cols)
    vals = np.asarray(A.vals, dtype=np.float64)
    T = A.n_slices
    out = np.zeros((T, A.n_nodes, 2))
    for k in range(T):
        np.add.at(out[k, :, 0], cols[k], vals[k])
        np.add.at(out[k, :, 1], rows[k], vals[k])
    return out


def spectral_features_np(A: TemporalCOO, k: int = 2) -> np.ndarray:
    """(T, N, k) spectral node features, constant across slices.

    Top-k eigenvectors (after the trivial leading one) of the
    symmetrically normalized time-aggregated adjacency
    D^{-1/2}(ΣₜAₜ)D^{-1/2} — the classic spectral-embedding community
    signal. The reference has no such option (its SBM link-prediction
    experiments use degree features only, SBM_our.py:151-158, which
    carry no community information: every node's expected degree is
    equal, so trained MAP stays at the negative-sampling base rate).
    This is the discriminative feature option that turns the SBM config
    into a meaningful accuracy regression test.

    Host-side (dense eigh at SBM scale, N≈1000) — runs once during
    data preparation.
    """
    rows = np.asarray(A.rows)
    cols = np.asarray(A.cols)
    vals = np.asarray(A.vals, dtype=np.float64)
    nnz = np.asarray(A.nnz)
    N, T = A.n_nodes, A.n_slices
    agg = np.zeros((N, N))
    for t in range(T):
        n = int(nnz[t])
        np.add.at(agg, (rows[t][:n], cols[t][:n]), vals[t][:n])
    agg = (agg + agg.T) / 2
    deg = agg.sum(1)
    inv_sqrt = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
    norm = inv_sqrt[:, None] * agg * inv_sqrt[None, :]
    eigvals, eigvecs = np.linalg.eigh(norm)
    # Largest eigenpair is the trivial sqrt-degree direction; the next k
    # carry the block structure.
    vecs = eigvecs[:, -(k + 1) : -1][:, ::-1]
    # Scale to O(degree) magnitude so they survive alongside degree
    # features without per-dataset standardization.
    vecs = vecs * np.sqrt(N)
    return np.broadcast_to(vecs[None], (T, N, k)).copy()
