"""Sharded TM-GCN training step over a (graph, time) mesh.

The multi-chip execution path: TM-GCN's forward under ``shard_map`` with
explicit collectives, differentiable end-to-end, jitted over the mesh.

v1 data movement (correct, collective-based; halo-exchange overlap is a
later optimization):

  * features X are time-sharded; the M-transform all-gathers X along
    ``time`` and computes the local band rows of M ×₁ X (banded M means
    only band-width neighbor slices are actually read — the all-gather
    over-fetches but XLA overlaps it with the local SpMM setup).
  * the adjacency is row-partitioned along ``graph`` (local rows) with
    global columns; local SpMM gathers from the full feature matrix and
    segment-sums into the shard's row block. No communication.
  * the edge readout all-gathers the (small, F-wide) embeddings along
    ``graph`` then ``time`` and computes logits for the full edge set on
    every shard (edges replicated); the loss is identical on all shards
    so gradients need no extra reduction beyond what autodiff inserts.

Params and M are replicated; gradient psum is inserted by shard_map's
transpose automatically.

The v1 all-gather readout above is the readability/parity baseline; the
production path (``make_sharded_train_step_halo`` and
``parallel/adapter.py``) uses :func:`readout_partitioned` — owner-
computes partial logits + one (Eb, C) psum over ``graph`` — so no shard
materializes the full edge set or embedding tensor.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import numpy as np

from tmgcn_tpu.parallel.mesh import GRAPH_AXIS, TIME_AXIS
from tmgcn_tpu.parallel.partition import ShardedTemporalCOO
from tmgcn_tpu.train.losses import weighted_cross_entropy


def _local_spmm(rows, cols, vals, x_full, n_local_rows):
    """One local slice: gather global cols, reduce into local rows."""
    gathered = x_full[cols] * vals[:, None].astype(x_full.dtype)
    return jax.ops.segment_sum(
        gathered, rows, num_segments=n_local_rows, indices_are_sorted=True
    )


def make_sharded_forward(mesh: Mesh, n_local_rows: int, use_Minv: bool = False):
    """Build the shard_map'd TM-GCN 1-layer forward.

    Returns forward(params, A(ShardedTemporalCOO), X, M, edges) -> logits
    where X is (T, N, F) time-sharded, edges (3, E) replicated.
    """

    def local_forward(W, U, rows, cols, vals, X_loc, M, edges):
        # rows/cols/vals: (T_loc, 1, Pg) — squeeze the graph-shard dim.
        rows, cols, vals = rows[:, 0], cols[:, 0], vals[:, 0]
        T = M.shape[0]
        t_idx = jax.lax.axis_index(TIME_AXIS)
        T_loc = X_loc.shape[0]

        # M-transform: all-gather features over time, apply local M rows.
        X_full = jax.lax.all_gather(X_loc, TIME_AXIS, axis=0, tiled=True)  # (T, N, F)
        M_rows = jax.lax.dynamic_slice_in_dim(M, t_idx * T_loc, T_loc, axis=0)
        Xt_loc = jnp.einsum(
            "st,tnf->snf", M_rows.astype(X_full.dtype), X_full
        )  # (T_loc, N, F)

        # Local SpMM into this shard's row block.
        Y_loc = jax.vmap(lambda r, c, v, x: _local_spmm(r, c, v, x, n_local_rows))(
            rows, cols, vals, Xt_loc
        )  # (T_loc, N_loc, F0)
        Y_loc = jnp.matmul(Y_loc, W.astype(Y_loc.dtype))  # (T_loc, N_loc, F1)

        # Assemble full embeddings for the readout.
        Y_rows = jax.lax.all_gather(Y_loc, GRAPH_AXIS, axis=1, tiled=True)  # (T_loc, N_pad, F1)
        Y_full = jax.lax.all_gather(Y_rows, TIME_AXIS, axis=0, tiled=True)  # (T, N_pad, F1)

        F1 = Y_full.shape[-1]
        flat = Y_full.reshape(-1, F1)
        n_pad = Y_full.shape[1]
        src = flat[edges[0] * n_pad + edges[1]]
        trg = flat[edges[0] * n_pad + edges[2]]
        U = U.astype(flat.dtype)
        return src @ U[:F1] + trg @ U[F1:]

    spec_A = P(TIME_AXIS, GRAPH_AXIS, None)
    fwd = shard_map(
        local_forward,
        mesh=mesh,
        in_specs=(
            P(),  # W
            P(),  # U
            spec_A,  # rows
            spec_A,  # cols
            spec_A,  # vals
            P(TIME_AXIS, None, None),  # X
            P(),  # M
            P(),  # edges
        ),
        out_specs=P(),
        check_vma=False,
    )

    def forward(params, A: ShardedTemporalCOO, X, M, edges):
        return fwd(params["W"], params["U"], A.rows, A.cols, A.vals, X, M, edges)

    return forward


def make_sharded_train_step(mesh: Mesh, n_local_rows: int, optimizer):
    """Jitted sharded training step: (params, opt_state, batch) -> ...

    batch = dict(A=ShardedTemporalCOO, X, M, edges, targets, class_weights).
    """
    forward = make_sharded_forward(mesh, n_local_rows)
    repl = NamedSharding(mesh, P())

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, A, X, M, edges, targets, class_weights):
        def loss_fn(p):
            logits = forward(p, A, X, M, edges)
            return weighted_cross_entropy(logits, targets, class_weights)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state)
        params = jax.tree.map(lambda a, b: a + b, params, updates)
        return params, opt_state, loss

    return train_step


def partition_edges_by_time(
    edges: np.ndarray,
    targets: np.ndarray,
    n_slices: int,
    n_time: int,
    pad_multiple: int = 128,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Bucket labeled edges by time shard (host-side).

    Returns (edges_sh, targets_sh, mask_sh) with shapes (n_time, 3, E),
    (n_time, E), (n_time, E); slice ids are shard-local.
    """
    import numpy as _np

    edges = _np.asarray(edges)
    targets = _np.asarray(targets)
    if n_slices % n_time:
        raise ValueError(f"T={n_slices} not divisible by n_time={n_time}")
    t_loc = n_slices // n_time
    shard_of = edges[0] // t_loc
    counts = [_np.sum(shard_of == i) for i in range(n_time)]
    E = max(1, max(counts))
    E = ((E + pad_multiple - 1) // pad_multiple) * pad_multiple
    edges_sh = _np.zeros((n_time, 3, E), _np.int32)
    targets_sh = _np.zeros((n_time, E), targets.dtype)
    mask_sh = _np.zeros((n_time, E), bool)
    for i in range(n_time):
        m = shard_of == i
        k = int(m.sum())
        e = edges[:, m].copy()
        e[0] -= i * t_loc
        edges_sh[i, :, :k] = e
        targets_sh[i, :k] = targets[m]
        mask_sh[i, :k] = True
    return edges_sh, targets_sh, mask_sh


def readout_partitioned(flat, edges_b, mask, U, n_local_rows):
    """Owner-computes split-U edge readout on this shard's row block.

    Each graph shard scores only the edge endpoints whose node rows it
    owns (masked local gather); one ``psum`` of the (Eb, C) partial
    logits over ``graph`` assembles the full logits — no shard ever
    all-gathers the embedding tensor or materializes remote rows.

    Args:
        flat: (T_loc * N_loc, F) this shard's embedding rows.
        edges_b: (3, Eb) this time shard's edges — local slice ids,
            global node ids.
        mask: (Eb,) valid-edge mask (padding excluded).
        U: (2F, C) split readout weights (reference concat convention).
    Returns:
        (Eb, C) logits, identical on every graph shard.
    """
    F = flat.shape[-1]
    g_idx = jax.lax.axis_index(GRAPH_AXIS)
    n0 = g_idx * n_local_rows

    def side(nodes, Upart):
        own = mask & (nodes >= n0) & (nodes < n0 + n_local_rows)
        idx = jnp.where(own, edges_b[0] * n_local_rows + (nodes - n0), 0)
        rows = jnp.where(own[:, None], flat[idx], jnp.zeros((), flat.dtype))
        return rows @ Upart

    part = side(edges_b[1], U[:F]) + side(edges_b[2], U[F:])
    return jax.lax.psum(part, GRAPH_AXIS)


def make_sharded_train_step_halo(
    mesh: Mesh,
    n_local_rows: int,
    optimizer,
    m_blocks: np.ndarray,
    halo: int,
):
    """Optimized sharded step: banded halo exchange + partitioned edges.

    vs the v1 step: the M-transform moves only (halo, N, F) between
    time-neighbors (ppermute) instead of all-gathering X; each time
    shard scores only its own edges; and the readout is owner-computes —
    one psum of (Eb, C) partial logits over ``graph`` instead of
    all-gathering the (T_loc, N, F1) embeddings. The loss reduces with
    one psum of two scalars over ``time``.

    Args:
        m_blocks: (n_time, T_loc, T_loc+halo) from halo.local_banded_m.
        halo: band - 1 of the M matrix.
    """
    from tmgcn_tpu.parallel.halo import banded_m_transform_local

    def local_step(W, U, rows, cols, vals, X_loc, m_block, edges, targets, mask, cw):
        rows, cols, vals = rows[:, 0], cols[:, 0], vals[:, 0]
        m_block = m_block[0]
        edges, targets, mask = edges[0], targets[0], mask[0]

        Xt_loc = banded_m_transform_local(X_loc, m_block, halo)
        Y_loc = jax.vmap(lambda r, c, v, x: _local_spmm(r, c, v, x, n_local_rows))(
            rows, cols, vals, Xt_loc
        )
        Y_loc = jnp.matmul(Y_loc, W.astype(Y_loc.dtype))

        T_loc, N_loc, F1 = Y_loc.shape
        flat = Y_loc.reshape(T_loc * N_loc, F1)
        logits = readout_partitioned(
            flat, edges, mask, U.astype(flat.dtype), n_local_rows
        )

        # One-hot contractions, not take_along_axis — the TPU row-gather
        # dominates the epoch otherwise (see train/losses.py).
        logp = jax.nn.log_softmax(logits, axis=-1)
        onehot = jax.nn.one_hot(targets, logits.shape[-1], dtype=logits.dtype)
        nll = -jnp.sum(logp * onehot, axis=-1)
        w = (onehot @ cw.astype(logits.dtype)) * mask.astype(logits.dtype)
        num = jax.lax.psum(jnp.sum(w * nll), TIME_AXIS)
        den = jax.lax.psum(jnp.sum(w), TIME_AXIS)
        return num / den

    spec_A = P(TIME_AXIS, GRAPH_AXIS, None)
    loss_fn_sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P(),  # W
            P(),  # U
            spec_A,  # rows
            spec_A,  # cols
            spec_A,  # vals
            P(TIME_AXIS, None, None),  # X
            P(TIME_AXIS, None, None),  # m_blocks
            P(TIME_AXIS, None, None),  # edges
            P(TIME_AXIS, None),  # targets
            P(TIME_AXIS, None),  # mask
            P(),  # class weights
        ),
        out_specs=P(),
        check_vma=False,
    )

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, A, X, edges_sh, targets_sh, mask_sh, cw):
        def loss_fn(p):
            return loss_fn_sharded(
                p["W"], p["U"], A.rows, A.cols, A.vals, X,
                jnp.asarray(m_blocks, X.dtype), edges_sh, targets_sh, mask_sh, cw,
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state)
        params = jax.tree.map(lambda a, b: a + b, params, updates)
        return params, opt_state, loss

    return train_step


def shard_batch(mesh: Mesh, A: ShardedTemporalCOO, X, M, edges, targets):
    """Place batch arrays with their mesh shardings."""
    spec_A = NamedSharding(mesh, P(TIME_AXIS, GRAPH_AXIS, None))
    put = jax.device_put
    return dict(
        A=ShardedTemporalCOO(
            rows=put(A.rows, spec_A),
            cols=put(A.cols, spec_A),
            vals=put(A.vals, spec_A),
            nnz=put(A.nnz, NamedSharding(mesh, P(TIME_AXIS, GRAPH_AXIS))),
            n_nodes=A.n_nodes,
            n_local_rows=A.n_local_rows,
            n_graph_shards=A.n_graph_shards,
        ),
        X=put(X, NamedSharding(mesh, P(TIME_AXIS, None, None))),
        M=put(M, NamedSharding(mesh, P())),
        edges=put(edges, NamedSharding(mesh, P())),
        targets=put(targets, NamedSharding(mesh, P())),
    )
