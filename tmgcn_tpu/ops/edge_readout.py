"""Edge readout: gather per-edge endpoint embeddings and classify.

Every model family shares this head (capability reference: the
edge_src_nodes/edge_trg_nodes gather + concat + ``@ U`` in IBM/TM-GCN,
TensorGCN-master/embedding_help_functions.py:196-198,228-233): for each
labeled edge (k, i, j), read node embeddings Y[k, i] and Y[k, j] from the
(T, N, F) embedding tensor, concatenate to (E, 2F), and apply the final
linear classifier U in R^{2F x C}.

TPU notes: the gather is a flat take on (T*N, F) with a static edge
count per prepared window. Its autodiff transpose is a scatter-add into
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


def edge_readout_bilinear(
    Y: jax.Array,
    edges: jax.Array,
    U: jax.Array,
) -> jax.Array:
    """Per-edge logits from the elementwise PRODUCT of endpoint embeddings.

    logits = (Y[k,i] ⊙ Y[k,j]) @ U with U in R^{F x C}. A framework
    extension beyond the reference (whose concat readout
    `[Y_src, Y_trg] @ U`, embedding_help_functions.py:228-233, is
    additive in the endpoints and therefore cannot express
    same-community affinity — the signal that makes SBM link prediction
    learnable; see configs/schema.ExperimentConfig.readout).
    """
    T, N, F = Y.shape
    flat = Y.reshape(T * N, F)
    src_idx, trg_idx = edge_flat_indices(edges, N)
    return (flat[src_idx] * flat[trg_idx]) @ U.astype(Y.dtype)


def edge_embeddings(Y: jax.Array, edges: jax.Array) -> jax.Array:
    """The explicit (E, 2F) concatenated edge embeddings (for tests)."""
    T, N, F = Y.shape
    flat = Y.reshape(T * N, F)
    src_idx, trg_idx = edge_flat_indices(edges, N)
    return jnp.concatenate([flat[src_idx], flat[trg_idx]], axis=1)


import dataclasses
from functools import partial


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["src", "trg", "sort_cols", "packed"],
    meta_fields=["n_rows", "interpret", "lane_major"],
)
@dataclasses.dataclass(frozen=True)
class ReadoutPlan:
    """Prepacked fast-backward plan for the edge readout (a pytree).

    The backward of the endpoint gather is a scatter-add into (T*N, F) —
    XLA serializes it (~50ns/row on TPU v5e, the dominant cost of a
    training epoch on the real configs). The plan pre-sorts the combined
    (src ++ trg) flat indices and runs the backward through the same
    windowed one-hot MXU kernel as the SpMM.

    sort_cols composes the sort permutation with the kernel's chunk
    layout: gradient rows are gathered once, directly into chunk order.

    lane_major: run the backward through the TRANSPOSED-output kernel
    ((F, T*N) with rows on lanes) — at T*N in the tens of millions the
    standard kernel's (T*N, F~6) output in Mosaic's (8,128)-tiled
    layout pads 21x (15 GB at 32M rows — the 500k-node recurrent OOM,
    results/recurrent_compile_boundary.md); the lane-major layout pads
    only 8/F on sublanes.
    """

    src: jax.Array  # (E,) flat src ids
    trg: jax.Array  # (E,) flat trg ids
    sort_cols: jax.Array  # (J*C,) indices into the unsorted (2E, F) grads
    packed: object  # PackedSpmm scatter plan over the sorted rows
    n_rows: int  # T*N
    interpret: bool
    lane_major: bool = False


# Past this padded-bytes budget for the standard kernel's (T*N, F)
# cotangent (~rows/8 * 4 kB), the plan switches to the lane-major
# kernel automatically.
LANE_MAJOR_BYTES = 2 << 30


def make_readout_plan(
    edges, n_slices: int, n_nodes: int, chunk: int = 256, window: int = 256,
    interpret: bool | None = None,
    lane_major: bool | None = None,
) -> ReadoutPlan:
    """Build the plan host-side, once per edge set.

    interpret=None auto-selects the Pallas interpreter off-TPU;
    lane_major=None auto-selects the transposed-output backward kernel
    past LANE_MAJOR_BYTES of padded standard-layout cotangent.
    """
    import numpy as np

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if lane_major is None:
        lane_major = (n_slices * n_nodes // 8 + 1) * 4096 > LANE_MAJOR_BYTES

    from tmgcn_tpu.core.sparse import TemporalCOO
    from tmgcn_tpu.kernels.spmm_pallas import pack_windowed

    edges_np = np.asarray(edges)
    E = edges_np.shape[1]
    src = edges_np[0].astype(np.int64) * n_nodes + edges_np[1]
    trg = edges_np[0].astype(np.int64) * n_nodes + edges_np[2]
    both = np.concatenate([src, trg])  # (2E,)
    perm = np.argsort(both, kind="stable")
    sorted_rows = both[perm]

    # Reuse the SpMM packer: a 1-slice tensor whose rows are the sorted
    # scatter targets and whose cols index the sorted gradient stream.
    # all_windows=False: the scatter touches ~2E of T*N rows; empty-
    # window chunks would dominate the kernel 7x (results/
    # wdgcn_profile.json). The backward passes a zero init aliased as
    # the output store instead.
    from tmgcn_tpu.kernels.spmm_pallas import pack_windowed_flat

    packed = pack_windowed_flat(
        sorted_rows,
        np.arange(2 * E, dtype=np.int64),
        np.ones(2 * E, np.float32),
        n_slices * n_nodes,
        chunk=chunk,
        window=window,
        all_windows=False,
    )
    sort_cols = perm[np.asarray(packed.cols).reshape(-1)].astype(np.int32)
    return ReadoutPlan(
        src=jnp.asarray(src.astype(np.int32)),
        trg=jnp.asarray(trg.astype(np.int32)),
        sort_cols=jnp.asarray(sort_cols),
        packed=packed,
        n_rows=n_slices * n_nodes,
        interpret=interpret,
        lane_major=bool(lane_major),
    )


@jax.custom_vjp
def apply_readout(plan: ReadoutPlan, Y: jax.Array, U: jax.Array) -> jax.Array:
    """(E, C) logits with the fast-backward plan."""
    F = Y.shape[-1]
    flat = Y.reshape(plan.n_rows, F)
    U2 = U.astype(Y.dtype)
    return flat[plan.src] @ U2[:F] + flat[plan.trg] @ U2[F:]


def _readout_fwd(plan, Y, U):
    return apply_readout(plan, Y, U), (plan, Y, U)


def _readout_bwd(res, g):
    from tmgcn_tpu.kernels.spmm_pallas import (
        windowed_segment_matmul,
        windowed_segment_matmul_t,
    )

    plan, Y, U = res
    F = Y.shape[-1]
    flat = Y.reshape(plan.n_rows, F)
    U2 = U.astype(Y.dtype)
    dU = jnp.concatenate(
        [flat[plan.src].T @ g, flat[plan.trg].T @ g], axis=0
    ).astype(U.dtype)
    packed = plan.packed
    if plan.lane_major:
        # Lane-major backward: every big intermediate keeps rows on the
        # LANE axis — (F, 2E) gradient rows, (J, F, C) chunk blocks,
        # (F, n_rows_out) kernel output — so nothing materializes the
        # 21x-padded (rows, F~6) layout at huge T*N.
        d_both_t = jnp.concatenate(
            [U2[:F] @ g.T, U2[F:] @ g.T], axis=1
        )  # (F, 2E)
        gathered_t = (
            d_both_t[:, plan.sort_cols]
            .reshape(F, packed.n_chunks, packed.chunk)
            .transpose(1, 0, 2)
        )
        dflat_t = windowed_segment_matmul_t(
            packed, gathered_t, interpret=plan.interpret,
            init=jnp.zeros((F, packed.n_rows_out), gathered_t.dtype),
        )
        dY = dflat_t[:, : plan.n_rows].T.reshape(Y.shape)
    else:
        # dY: scatter g @ U_sideᵀ rows through the sorted windowed
        # kernel; sort_cols gathers gradient rows directly into chunk
        # order (padding entries carry val 0, so their rows are
        # ignored).
        d_both = jnp.concatenate([g @ U2[:F].T, g @ U2[F:].T], axis=0)  # (2E, F)
        gathered = d_both[plan.sort_cols].reshape(
            packed.n_chunks, packed.chunk, F
        )
        dflat = windowed_segment_matmul(
            packed, gathered, interpret=plan.interpret,
            init=jnp.zeros((packed.n_rows_out, F), gathered.dtype),
        )
        dY = dflat[: plan.n_rows].reshape(Y.shape)
    from tmgcn_tpu.kernels.spmm_pallas import _zero_cotangent

    return _zero_cotangent(plan), dY, dU


apply_readout.defvjp(_readout_fwd, _readout_bwd)


def make_readout_operator(
    edges, n_slices: int, n_nodes: int, chunk: int = 256, window: int = 256,
    interpret: bool = False,
):
    """Convenience closure form of the plan (for eager/host use)."""
    plan = make_readout_plan(edges, n_slices, n_nodes, chunk, window, interpret)
    return lambda Y, U: apply_readout(plan, Y, U)
