"""Edge readout: gather per-edge endpoint embeddings and classify.

Every model family shares this head (capability reference: the
edge_src_nodes/edge_trg_nodes gather + concat + ``@ U`` in IBM/TM-GCN,
TensorGCN-master/embedding_help_functions.py:196-198,228-233): for each
labeled edge (k, i, j), read node embeddings Y[k, i] and Y[k, j] from the
(T, N, F) embedding tensor, concatenate to (E, 2F), and apply the final
linear classifier U in R^{2F x C}.

TPU notes: the gather is a flat take on (T*N, F) with static edge count
(tasks pad the edge list; padded entries index slice 0/node 0 and are
masked out of the loss). Its autodiff transpose is a scatter-add into
(T*N, F) which XLA executes deterministically on TPU. The concat is
avoided by splitting U into source/target halves — two (E,F) x (F,C)
matmuls that XLA fuses — which keeps the lane dimension dense instead of
materializing an (E, 2F) intermediate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def edge_flat_indices(edges: jax.Array, n_nodes: int) -> tuple[jax.Array, jax.Array]:
    """Flat (T*N) indices of edge endpoints.

    Args:
        edges: (3, E) int array of [slice, src, trg] per edge.
    Returns:
        (src_flat, trg_flat), each (E,).
    """
    return edges[0] * n_nodes + edges[1], edges[0] * n_nodes + edges[2]


def edge_readout(
    Y: jax.Array,
    edges: jax.Array,
    U: jax.Array,
) -> jax.Array:
    """Per-edge logits: concat(Y[k,i], Y[k,j]) @ U, without the concat.

    Args:
        Y: (T, N, F) node embeddings.
        edges: (3, E) int [slice, src, trg].
        U: (2F, C) classifier.
    Returns:
        (E, C) logits in Y.dtype.
    """
    T, N, F = Y.shape
    flat = Y.reshape(T * N, F)
    src_idx, trg_idx = edge_flat_indices(edges, N)
    src = flat[src_idx]
    trg = flat[trg_idx]
    U = U.astype(Y.dtype)
    U_src, U_trg = U[:F], U[F:]
    return src @ U_src + trg @ U_trg


def edge_embeddings(Y: jax.Array, edges: jax.Array) -> jax.Array:
    """The explicit (E, 2F) concatenated edge embeddings (for tests)."""
    T, N, F = Y.shape
    flat = Y.reshape(T * N, F)
    src_idx, trg_idx = edge_flat_indices(edges, N)
    return jnp.concatenate([flat[src_idx], flat[trg_idx]], axis=1)
