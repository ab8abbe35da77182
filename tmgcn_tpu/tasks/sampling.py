"""Negative edge sampling for link prediction.

Capability reference: augment_edges in IBM/TM-GCN (TensorGCN-master/
embedding_help_functions.py:500-526): per slice j, append
``beta * (#real edges in j)`` uniformly random (src, trg) pairs that do
not coincide with a real edge of that slice; real edges get label 0
(positive class), fakes label 1; the result is stably sorted by slice.

The reference's sampler is an unseeded sequential rejection loop with an
O(E_slice) membership test per candidate. Here: a seeded, vectorized
batch-rejection sampler (hash-set membership, oversampled draws) with
identical semantics — fakes may still duplicate each other and may be
self-loops, exactly like the reference.
"""

from __future__ import annotations

import numpy as np


def augment_edges(
    edges: np.ndarray,
    n_nodes: int,
    beta1: int,
    beta2: int,
    cutoff: int,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Augment real edges with sampled negatives.

    Args:
        edges: (3, E) int [slice, src, trg] of real edges.
        n_nodes: N.
        beta1: negatives per real edge for slices < cutoff.
        beta2: negatives per real edge for slices >= cutoff.
        cutoff: slice index where beta switches.
        seed: PRNG seed (the reference is unseeded; parity runs can
            instead ingest reference-generated edge sets).

    Returns:
        (edges_aug, labels): (3, E') augmented edges stably sorted by
        slice, and (E',) labels with 0 = real, 1 = fake.
    """
    edges = np.asarray(edges)
    rng = np.random.default_rng(seed)
    try:
        from tmgcn_tpu import native

        use_native = native.available()
    except Exception:
        use_native = False
    new_edges = []
    for j in range(int(edges[0].max()) + 1):
        beta = beta1 if j < cutoff else beta2
        slice_mask = edges[0] == j
        n_real = int(np.sum(slice_mask))
        to_add = beta * n_real
        if to_add == 0:
            continue
        key_arr = edges[1, slice_mask].astype(np.int64) * n_nodes + edges[2, slice_mask]
        if use_native:
            # C++ hash-set rejection sampler (deterministic per seed/slice).
            src, trg = native.sample_negatives(
                key_arr, n_nodes, to_add, seed * 0x9e3779b9 + j
            )
            new_edges.append(
                np.stack([np.full(to_add, j, dtype=edges.dtype), src, trg])
            )
            continue
        real_keys = set(key_arr.tolist())
        added = 0
        while added < to_add:
            batch = max(64, int((to_add - added) * 1.2))
            src = rng.integers(0, n_nodes, batch)
            trg = rng.integers(0, n_nodes, batch)
            keys = src.astype(np.int64) * n_nodes + trg
            ok = np.fromiter((k not in real_keys for k in keys.tolist()), bool, batch)
            src, trg = src[ok], trg[ok]
            take = min(len(src), to_add - added)
            if take:
                block = np.stack([np.full(take, j, dtype=edges.dtype), src[:take], trg[:take]])
                new_edges.append(block)
                added += take

    if new_edges:
        fakes = np.concatenate(new_edges, axis=1)
        edges_aug = np.concatenate([edges, fakes], axis=1)
    else:
        edges_aug = edges
    labels = np.concatenate(
        [np.zeros(edges.shape[1], dtype=np.int64),
         np.ones(edges_aug.shape[1] - edges.shape[1], dtype=np.int64)]
    )
    order = np.argsort(edges_aug[0], kind="stable")
    return edges_aug[:, order], labels[order]
