"""Sharded ModelAdapter: multi-chip TM-GCN behind the standard loops.

Builds a :class:`tmgcn_tpu.tasks.adapters.ModelAdapter` whose ``apply``
runs the TM-GCN forward under ``shard_map`` over a (graph x time) mesh,
so the *unmodified* training loops (train/loop.py — eval cadence,
checkpointing, lax.scan epoch chunks) execute multi-chip. Green-field
capability (the reference is single-process CPU — SURVEY.md §5
"Distributed communication backend").

Data movement per training step (the optimized layout):

  * the parameter-independent layer-1 propagation AtXt = Ct ⊛ (M ×₁ X)
    is computed ONCE at adapter build (banded multi-hop halo exchange
    along ``time`` for the M-transform, row-local SpMM along ``graph``)
    and cached SHARDED — (T, N, F0) split over (time, graph), exactly
    the single-device cached-AtXt semantics including the reference's
    f32 buffer truncation.
  * a step's forward reads the cached shard, applies W (and for 2-layer:
    nonlin -> all-gather rows along ``graph`` -> layer-2 local SpMM ->
    W2), then the **partitioned edge readout**: labeled edges are
    bucketed by time shard host-side; each shard computes the readout
    contribution of the endpoint rows it owns and one ``psum`` over
    ``graph`` assembles per-edge logits — no shard ever materializes the
    full (T, N, F) embedding tensor (the v1 all-gather readout's
    scaling cap). An all-gather along ``time`` of the per-bucket (Eb, C)
    logits plus a precomputed inverse permutation restores the original
    edge order, so losses/metrics match the single-device path bit-for-
    layout.

Traffic per step: psum (Eb, C) over graph + all-gather (Eb, C) over
time + (2-layer only) all-gather (T_loc, N, F1) over graph — vs the v1
path's all-gather of (T, N, F1) over graph AND time plus full-E
replicated scoring.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tmgcn_tpu.core.mmatrix import band_offsets
from tmgcn_tpu.core.sparse import TemporalCOO
from tmgcn_tpu.models.common import nonlinearity
from tmgcn_tpu.models.evolvegcn import EvolveGCN
from tmgcn_tpu.models.gcn import KWGCN
from tmgcn_tpu.models.tmgcn import TMGCN, TMGCN2
from tmgcn_tpu.models.wdgcn import WDGCN
from tmgcn_tpu.parallel.halo import banded_m_transform_local, local_banded_m
from tmgcn_tpu.parallel.mesh import GRAPH_AXIS, TIME_AXIS
from tmgcn_tpu.parallel.partition import partition_rows, pad_time
from tmgcn_tpu.parallel.tmgcn_sharded import readout_partitioned
from tmgcn_tpu.tasks.adapters import ModelAdapter

WINDOWS = ("train", "val", "test")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _local_spmm(rows, cols, vals, x_full, n_local_rows):
    gathered = x_full[cols] * vals[:, None].astype(x_full.dtype)
    return jax.ops.segment_sum(
        gathered, rows, num_segments=n_local_rows, indices_are_sorted=True
    )


def bucket_edges_by_time(
    edges: np.ndarray, T_pad: int, n_time: int, pad_multiple: int = 128
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Bucket (3, E) edges by time shard; local slice ids.

    Returns (edges_b (n_time, 3, Eb), mask (n_time, Eb), pos (E,)) where
    ``pos[e]`` is edge e's index in the bucket-concatenated order —
    ``stacked.reshape(n_time * Eb, C)[pos]`` restores original order.
    """
    edges = np.asarray(edges)
    E = edges.shape[1]
    t_loc = T_pad // n_time
    shard_of = edges[0] // t_loc
    counts = [int(np.sum(shard_of == i)) for i in range(n_time)]
    Eb = _round_up(max(1, max(counts)), pad_multiple)
    edges_b = np.zeros((n_time, 3, Eb), np.int32)
    mask = np.zeros((n_time, Eb), bool)
    pos = np.zeros(E, np.int64)
    for i in range(n_time):
        m = shard_of == i
        k = int(m.sum())
        e = edges[:, m].copy()
        e[0] -= i * t_loc
        edges_b[i, :, :k] = e
        mask[i, :k] = True
        pos[np.nonzero(m)[0]] = i * Eb + np.arange(k)
    return edges_b, mask, pos


def _prepare_banded_window(A, X, Mw, mesh, n_graph, n_time, halo):
    """Sharded per-window tensors for the banded TM-GCN propagation:
    row-partitioned adjacency, time-sharded features and local M blocks.
    Returns (bundle, T_pad, A_sh)."""
    T = A.n_slices
    T_pad = _round_up(T, n_time)
    if T_pad != T:
        X = np.concatenate(
            [X, np.zeros((T_pad - T,) + X.shape[1:], X.dtype)], axis=0
        )
        M_full = np.zeros((T_pad, T_pad), Mw.dtype)
        M_full[:T, :T] = Mw
        Mw = M_full
    A_sh = pad_time(partition_rows(A, n_graph), n_time)
    m_blocks = local_banded_m(Mw, n_time, halo)

    dt = jnp.result_type(float)
    put = jax.device_put
    spec_A = NamedSharding(mesh, P(TIME_AXIS, GRAPH_AXIS, None))
    spec_T = NamedSharding(mesh, P(TIME_AXIS, None, None))
    bundle = {
        "rows": put(jnp.asarray(A_sh.rows), spec_A),
        "cols": put(jnp.asarray(A_sh.cols), spec_A),
        "vals": put(jnp.asarray(A_sh.vals, dt), spec_A),
        "X": put(jnp.asarray(X, dt), spec_T),
        "m_blocks": put(jnp.asarray(m_blocks, dt), spec_T),
    }
    return bundle, T_pad, A_sh


@dataclasses.dataclass(frozen=True)
class _ShardCfg:
    n_graph: int
    n_time: int
    n_local_rows: int
    halo: int
    n_layers: int
    nonlin2: str
    dtype: object
    # Block-dense layer-2 mode string ("exact"/"fast"/"bf16"), or None
    # when the gather/segment path is used instead.
    l2_bd: str | None = None
    # Layer-2 M-mixing (the UCI apply_M_twice / apply_M_three_times
    # configuration, embedding_help_functions.py:342-346): each extra
    # mixing is one more banded halo exchange along ``time``.
    m2: bool = False
    m3: bool = False


def _l2_shard_streams(A_sh, n_time: int):
    """Yield each (time, graph) shard's flat layer-2 entry stream.

    Rows are shard-local over its T_loc slices; columns index the
    graph-all-gathered per-slice feature rows. Returns the common
    (n_in, n_out) too.
    """
    rows = np.asarray(A_sh.rows)
    cols = np.asarray(A_sh.cols)
    vals = np.asarray(A_sh.vals)
    nnz = np.asarray(A_sh.nnz)
    T_pad, G, _ = rows.shape
    t_loc = T_pad // n_time
    n_local = A_sh.n_local_rows
    N_pad = n_local * G  # graph-all-gathered row count per slice
    streams = []
    for ti in range(n_time):
        for gi in range(G):
            rs, cs, vs = [], [], []
            for k in range(t_loc):
                t = ti * t_loc + k
                n = int(nnz[t, gi])
                rs.append(rows[t, gi, :n].astype(np.int64) + k * n_local)
                cs.append(cols[t, gi, :n].astype(np.int64) + k * N_pad)
                vs.append(vals[t, gi, :n])
            streams.append((
                np.concatenate(rs) if rs else np.zeros(0, np.int64),
                np.concatenate(cs) if cs else np.zeros(0, np.int64),
                np.concatenate(vs) if vs else np.zeros(0, np.float32),
            ))
    return streams, t_loc * N_pad, t_loc * n_local


def _l2_blockdense_ratio(A_sh, n_time: int) -> float:
    """Stacked-block bytes vs tile-gather floor, summed over shards."""
    from tmgcn_tpu.ops.spmm_blockdense import estimate

    streams, _, _ = _l2_shard_streams(A_sh, n_time)
    ests = [estimate(r, c) for r, c, _ in streams if len(r)]
    if not ests:
        return float("inf")
    bytes_ = sum(e["block_bytes"] for e in ests)
    floor = sum(e["gather_floor_bytes"] for e in ests)
    return bytes_ / max(floor, 1)


def _pack_l2_blockdense(A_sh, n_time: int, mode: str = "exact") -> dict:
    """Per-(time, graph)-shard block-dense layer-2 operators, stacked.

    Each shard's local entry stream packs into its own
    BlockDenseOperator; shards are padded to a common block count (zero
    blocks scatter nothing) and stacked on two leading mesh axes so
    shard_map hands each device its own operator. Incidences are forced
    dense for shape uniformity.
    """
    from tmgcn_tpu.ops.spmm_blockdense import make_flat_operator

    G = np.asarray(A_sh.rows).shape[1]
    streams, n_in, n_out = _l2_shard_streams(A_sh, n_time)
    ops = [
        make_flat_operator(
            r, c, v, n_in=n_in, n_out=n_out, mode=mode,
            max_bytes=None, dense_limit=None,
        )
        for r, c, v in streams
    ]
    nb_max = max(op.n_blocks for op in ops)

    def padded(op):
        pad = nb_max - op.n_blocks
        return (
            np.pad(np.asarray(op.AblkT), ((0, pad), (0, 0), (0, 0))),
            np.pad(np.asarray(op.oh_rw), ((0, 0), (0, pad))),
            np.pad(np.asarray(op.oh_cw), ((0, pad), (0, 0))),
        )

    parts = [padded(op) for op in ops]
    stack = lambda i: np.stack([p[i] for p in parts]).reshape(
        (n_time, G) + parts[0][i].shape
    )
    return {
        "l2_ablkT": stack(0),
        "l2_ohrw": stack(1),
        "l2_ohcw": stack(2),
    }


def _make_propagate(mesh: Mesh, sc: _ShardCfg):
    """shard_map'd AtXt = Ct ⊛ (M ×₁ X): run once, cache sharded."""

    def local(rows, cols, vals, X_loc, m_block):
        rows, cols, vals = rows[:, 0], cols[:, 0], vals[:, 0]
        m_block = m_block[0]
        Xt_loc = banded_m_transform_local(X_loc, m_block, sc.halo)
        return jax.vmap(
            lambda r, c, v, x: _local_spmm(r, c, v, x, sc.n_local_rows)
        )(rows, cols, vals, Xt_loc)

    spec_A = P(TIME_AXIS, GRAPH_AXIS, None)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            spec_A, spec_A, spec_A,
            P(TIME_AXIS, None, None),  # X
            P(TIME_AXIS, None, None),  # m_blocks
        ),
        out_specs=P(TIME_AXIS, GRAPH_AXIS, None),
        check_vma=False,
    )


def _make_step_forward(mesh: Mesh, sc: _ShardCfg):
    """shard_map'd per-step forward: cached AtXt shard -> bucket logits."""

    def local(params, H_loc, rows, cols, vals, l2op_parts, m_blocks, edges_b, mask):
        rows, cols, vals = rows[:, 0], cols[:, 0], vals[:, 0]
        edges_b, mask = edges_b[0], mask[0]
        m_block = m_blocks[0]
        dtype = sc.dtype
        H = H_loc.astype(dtype)  # reference f32 buffer truncation
        U = params["U"].astype(dtype)
        if sc.n_layers == 1:
            Y_loc = jnp.matmul(H, params["W"].astype(dtype))
        else:
            Y = nonlinearity(sc.nonlin2)(jnp.matmul(H, params["W1"].astype(dtype)))
            if sc.m2:
                # apply_M_twice: re-mix the layer-1 output through M
                # before the layer-2 propagation — node-local, so it
                # runs on the (time, graph)-sharded tensor with one more
                # banded halo exchange along time.
                Y = banded_m_transform_local(Y, m_block, sc.halo)
            # Layer-2 SpMM gathers full-graph rows of this shard's
            # slices: one all-gather along graph (F1-wide — small).
            Y_rows = jax.lax.all_gather(Y, GRAPH_AXIS, axis=1, tiled=True)
            T_loc, N_pad, F1 = Y_rows.shape
            if sc.l2_bd is not None:
                # This shard's own block-dense operator (dense MXU
                # tiles, no per-row gather/scatter). Static metadata
                # comes from the (static) operand shapes, so the same
                # shard_map serves windows of different lengths.
                from tmgcn_tpu.ops.spmm_blockdense import BlockDenseOperator

                ablkT = l2op_parts["l2_ablkT"][0, 0]
                ohrw = l2op_parts["l2_ohrw"][0, 0]
                ohcw = l2op_parts["l2_ohcw"][0, 0]
                op = BlockDenseOperator(
                    AblkT=ablkT, oh_rw=ohrw, oh_cw=ohcw,
                    n_in=T_loc * N_pad, n_out=T_loc * sc.n_local_rows,
                    block=ablkT.shape[-1], mode=sc.l2_bd,
                    nrb=ohrw.shape[0], ncb=ohcw.shape[-1],
                )
                Z = op(Y_rows.reshape(T_loc * N_pad, F1)).reshape(
                    T_loc, sc.n_local_rows, F1
                )
            else:
                Z = jax.vmap(
                    lambda r, c, v, x: _local_spmm(r, c, v, x, sc.n_local_rows)
                )(rows, cols, vals, Y_rows)
            Y_loc = jnp.matmul(Z.astype(dtype), params["W2"].astype(dtype))
            if sc.m3:
                # apply_M_three_times: one final banded mixing after
                # layer 2 (native dtype — the reference's f64 upcast is
                # its interlayer_dtype parity quirk, unsupported here).
                Y_loc = banded_m_transform_local(Y_loc, m_block, sc.halo)
        T_loc, N_loc, F = Y_loc.shape
        flat = Y_loc.reshape(T_loc * N_loc, F)
        return readout_partitioned(flat, edges_b, mask, U, sc.n_local_rows)[None]

    spec_A = P(TIME_AXIS, GRAPH_AXIS, None)
    l2_spec = {
        "l2_ablkT": P(TIME_AXIS, GRAPH_AXIS, None, None, None),
        "l2_ohrw": P(TIME_AXIS, GRAPH_AXIS, None, None),
        "l2_ohcw": P(TIME_AXIS, GRAPH_AXIS, None, None),
    } if sc.l2_bd is not None else {}
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(),  # params (replicated)
            P(TIME_AXIS, GRAPH_AXIS, None),  # cached AtXt
            spec_A, spec_A, spec_A,
            l2_spec,  # per-shard block-dense operator parts (or empty)
            P(TIME_AXIS, None, None),  # per-shard banded M blocks
            P(TIME_AXIS, None, None),  # edge buckets
            P(TIME_AXIS, None),  # bucket mask
        ),
        out_specs=P(TIME_AXIS, None, None),
        check_vma=False,
    )


def make_sharded_edge_adapter(
    model,
    adj: dict[str, TemporalCOO],
    feats: dict[str, np.ndarray],
    edges: dict[str, np.ndarray],
    M: np.ndarray,
    mesh: Mesh,
    drop_last_slice: bool = False,
    l2_impl: str = "auto",
) -> ModelAdapter:
    """Sharded drop-in for tasks.adapters.make_edge_adapter.

    Supports TMGCN and TMGCN2 (condensed_W, use_Minv=False; layer-2
    default path AND the UCI apply_M_twice/apply_M_three_times mixing,
    each extra mixing one more banded halo exchange) and KWGCN (the
    no-M baseline: the same machinery with an identity M, so the banded
    exchange degenerates to a copy with halo 0) over a (graph x time)
    mesh, plus the recurrent families (EvolveGCN, WD-GCN) over the graph
    axis (their time recurrence is sequential; require n_time == 1).

    l2_impl selects the per-epoch layer-2 SpMM implementation:
    "blockdense" (each shard applies its own block-dense operator),
    "gather" (per-slice gather/segment-sum), or "auto" (block-dense
    whenever the stacked block tensors move fewer bytes than the
    tile-gather floor — same criterion as the single-device adapter).
    """
    if isinstance(model, (EvolveGCN, WDGCN)):
        return _make_recurrent_sharded_adapter(
            model, adj, feats, edges, mesh, drop_last_slice
        )
    m2 = m3 = False
    remap_params = None
    if isinstance(model, KWGCN):
        # KWGCN = the TM-GCN pipeline with no temporal mixing: run the
        # same sharded machinery under an identity M (halo 0 — the
        # banded exchange degenerates to a local copy).
        if model.interlayer_dtype is not None:
            raise NotImplementedError(
                "sharded KWGCN does not reproduce interlayer_dtype (the "
                "f64 parity cast); use the single-device adapter"
            )
        n_layers = model.n_layers
        nonlin2 = model.nonlin2
        M = np.eye(adj["train"].n_slices)
        if n_layers == 1:
            # 1-layer KWGCN names its weight W1 (models/gcn.py); the
            # shared step kernel reads W.
            remap_params = lambda p: {"W": p["W1"], "U": p["U"]}
    elif isinstance(model, TMGCN2):
        if model.use_Minv or not model.condensed_W:
            raise NotImplementedError(
                "sharded TMGCN2 supports condensed_W without Minv"
            )
        if model.interlayer_dtype is not None:
            raise NotImplementedError(
                "sharded TMGCN2 does not reproduce interlayer_dtype (the "
                "f64 parity cast); use the single-device adapter"
            )
        n_layers = 2
        nonlin2 = model.nonlin2
        m2, m3 = model.apply_M_twice, model.apply_M_three_times
    elif isinstance(model, TMGCN):
        if model.use_Minv or not model.condensed_W:
            raise NotImplementedError(
                "sharded TMGCN supports condensed_W without Minv"
            )
        if getattr(model, "readout", "concat") != "concat":
            raise NotImplementedError(
                "sharded TMGCN supports the concat readout (the "
                "partitioned readout splits U into src/trg halves)"
            )
        n_layers = 1
        nonlin2 = "relu"
    else:
        raise TypeError(f"unsupported sharded model: {type(model).__name__}")

    n_graph = mesh.shape[GRAPH_AXIS]
    n_time = mesh.shape[TIME_AXIS]
    M = np.asarray(M)
    halo = band_offsets(M)[0]

    bundles = {}
    shards = {}
    for w in WINDOWS:
        A, X = adj[w], np.asarray(feats[w])
        # KWGCN baselines use DISJOINT windows whose widths differ
        # (s_train vs s_val/s_test); size each window's identity M to it.
        Mw = np.eye(A.n_slices) if isinstance(model, KWGCN) else M
        if drop_last_slice:
            A = A.slice_window(0, A.n_slices - 1)
            X = X[:-1]
            Mw = Mw[:-1, :-1]
        bundle, T_pad, A_sh = _prepare_banded_window(
            A, X, Mw, mesh, n_graph, n_time, halo
        )
        shards[w] = A_sh
        e_b, e_mask, e_pos = bucket_edges_by_time(edges[w], T_pad, n_time)

        put = jax.device_put
        spec_T = NamedSharding(mesh, P(TIME_AXIS, None, None))
        bundle.update(
            edges_b=put(jnp.asarray(e_b), spec_T),
            mask=put(jnp.asarray(e_mask), NamedSharding(mesh, P(TIME_AXIS, None))),
            pos=put(jnp.asarray(e_pos), NamedSharding(mesh, P())),
            n_edges=int(np.asarray(edges[w]).shape[1]),
        )
        bundles[w] = bundle

    l2_bd = None
    if n_layers == 2:
        if l2_impl == "auto":
            ratio = _l2_blockdense_ratio(shards["train"], n_time)
            l2_impl = "blockdense" if ratio < 0.5 else "gather"
        if l2_impl == "blockdense":
            l2_bd = "exact"
        elif l2_impl != "gather":
            raise ValueError(f"unknown l2_impl: {l2_impl!r}")
        if l2_bd is not None:
            spec = {
                "l2_ablkT": NamedSharding(
                    mesh, P(TIME_AXIS, GRAPH_AXIS, None, None, None)
                ),
                "l2_ohrw": NamedSharding(mesh, P(TIME_AXIS, GRAPH_AXIS, None, None)),
                "l2_ohcw": NamedSharding(mesh, P(TIME_AXIS, GRAPH_AXIS, None, None)),
            }
            for w in WINDOWS:
                parts = _pack_l2_blockdense(shards[w], n_time, mode=l2_bd)
                bundles[w]["l2op_parts"] = {
                    k: jax.device_put(jnp.asarray(v), spec[k])
                    for k, v in parts.items()
                }

    sc = _ShardCfg(
        n_graph=n_graph,
        n_time=n_time,
        n_local_rows=partition_rows(adj["train"], n_graph).n_local_rows,
        halo=halo,
        n_layers=n_layers,
        nonlin2=nonlin2,
        dtype=model.dtype,
        l2_bd=l2_bd,
        m2=m2,
        m3=m3,
    )
    propagate = _make_propagate(mesh, sc)
    step_forward = _make_step_forward(mesh, sc)

    # Cache the parameter-independent layer-1 propagation, sharded
    # (the single-device adapters do the same — the reference caches
    # AtXt at model init, embedding_help_functions.py:195).
    jit_prop = jax.jit(propagate)
    for b in bundles.values():
        b["cached"] = jit_prop(
            b["rows"], b["cols"], b["vals"], b["X"], b["m_blocks"]
        )

    def apply(variables, bundle, carry):
        p = variables["params"]
        if remap_params is not None:
            p = remap_params(p)
        stacked = step_forward(
            p,
            bundle["cached"],
            bundle["rows"],
            bundle["cols"],
            bundle["vals"],
            bundle.get("l2op_parts", {}),
            bundle["m_blocks"],
            bundle["edges_b"],
            bundle["mask"],
        )
        C = stacked.shape[-1]
        flat = stacked.reshape(-1, C)
        return flat[bundle["pos"]], carry

    def train_stats(variables, bundle, tgt, cw, logit_transform=None):
        """Loss + confusion WITHOUT un-bucketing the logits.

        ``flat[pos]`` above makes GSPMD all-gather the (E, C) logits
        along ``time`` to restore edge order — the eval-step asymptotic
        comm cap (utils/comm_model.py). Loss and confusion counts are
        permutation-invariant reductions, so the 99-in-100 non-eval
        epochs compute them on the time-SHARDED bucket logits directly:
        targets are scattered into bucket order (tiny, replicated) and
        the masked sums lower to scalar psums.
        """
        p = variables["params"]
        if remap_params is not None:
            p = remap_params(p)
        stacked = step_forward(
            p,
            bundle["cached"],
            bundle["rows"],
            bundle["cols"],
            bundle["vals"],
            bundle.get("l2op_parts", {}),
            bundle["m_blocks"],
            bundle["edges_b"],
            bundle["mask"],
        )
        C = stacked.shape[-1]
        flat = stacked.reshape(-1, C)
        if logit_transform is not None:
            flat = logit_transform(flat)
            C = flat.shape[-1]
        tgt_b = jnp.zeros((flat.shape[0],), jnp.asarray(tgt).dtype)
        tgt_b = tgt_b.at[bundle["pos"]].set(tgt)
        maskf = bundle["mask"].reshape(-1)

        from tmgcn_tpu.train.losses import weighted_cross_entropy

        loss = weighted_cross_entropy(flat, tgt_b, jnp.asarray(cw), mask=maskf)
        guess = jnp.argmax(flat, axis=1)
        tp = jnp.sum((guess == 0) & (tgt_b == 0) & maskf)
        fp = jnp.sum((guess == 0) & (tgt_b != 0) & maskf)
        fn = jnp.sum((guess != 0) & (tgt_b == 0) & maskf)
        return loss, (tp, fp, fn)

    def init(key):
        variables = model.init(key)
        repl = NamedSharding(mesh, P())
        return jax.device_put(variables, repl)

    return ModelAdapter(
        init, apply, bundles, lambda variables: (), train_stats=train_stats
    )

# ---------------------------------------------------------------------------
# Recurrent families (EvolveGCN, WD-GCN): graph-axis sharding.
#
# The time recurrence (weight-evolving GRU / per-node LSTM) is sequential,
# so these shard over ``graph`` only (n_time must be 1). Features X are
# tiny (degree features, F0 <= 6) and stay replicated; the cached A@X, the
# (T, N, F1) embeddings — the big tensors — and the edge readout are
# sharded. Per-step communication: none for WD-GCN (the LSTM is node-
# local) and none for 1-layer EvolveGCN (the GRU input summarize(X_t) is
# computed redundantly from the replicated X, so the evolved weights stay
# replicated without a collective); 2-layer EvolveGCN all-gathers the
# (N, F1) hidden layer once per step for its parameter-dependent SpMM.
# Capability reference: evolvegcn_functions.py:22-213,
# wd_gcn_functions.py:21-98 (single-process CPU in the reference).
# ---------------------------------------------------------------------------


def _make_recurrent_propagate(mesh: Mesh, n_local_rows: int):
    """shard_map'd per-slice AX = A @ X: X replicated, rows local."""

    def local(rows, cols, vals, X):
        rows, cols, vals = rows[:, 0], cols[:, 0], vals[:, 0]
        return jax.vmap(
            lambda r, c, v, x: _local_spmm(r, c, v, x, n_local_rows)
        )(rows, cols, vals, X)

    spec_A = P(None, GRAPH_AXIS, None)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_A, spec_A, spec_A, P()),
        out_specs=P(None, GRAPH_AXIS, None),
        check_vma=False,
    )


def _make_wdgcn_forward(mesh: Mesh, n_local_rows: int, model):
    from tmgcn_tpu.models.wdgcn import lstm_scan

    def local(params, buffers, AX_loc, edges_b, mask):
        edges_b, mask = edges_b[0], mask[0]
        AX = AX_loc.astype(model.dtype)  # reference f32 buffer truncation
        Y = jax.nn.relu(jnp.matmul(AX, params["W"].astype(AX.dtype)))
        Z = lstm_scan(params["lstm"], buffers["h_init"], buffers["c_init"], Y)
        T_loc, N_loc, F1 = Z.shape
        flat = Z.reshape(T_loc * N_loc, F1)
        U = buffers["U"].astype(flat.dtype)  # frozen, never trained
        return readout_partitioned(flat, edges_b, mask, U, n_local_rows)[None]

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(),  # params
            P(),  # buffers
            P(None, GRAPH_AXIS, None),  # cached AX
            P(TIME_AXIS, None, None),  # edge buckets (n_time=1)
            P(TIME_AXIS, None),
        ),
        out_specs=P(TIME_AXIS, None, None),
        check_vma=False,
    )


def _make_evolvegcn_forward(mesh: Mesh, n_local_rows: int, model):
    from tmgcn_tpu.models.evolvegcn import evolve_weight_stack, gru_cell

    n_layers = model.n_layers

    def local(params, W0s, rows, cols, vals, AX_loc, X_full, edges_b, mask):
        rows, cols, vals = rows[:, 0], cols[:, 0], vals[:, 0]
        edges_b, mask = edges_b[0], mask[0]

        # Layer-1 summaries come from the replicated X, so the weight
        # trajectory evolves in a GRU-only scan with no collective and
        # the propagation batches over all slices (models/evolvegcn.py).
        W_fin, W1s = evolve_weight_stack(params["cell1"], X_full, W0s[0])

        if n_layers == 1:
            Y = jnp.einsum("tnf,tfk->tnk", AX_loc, W1s).astype(model.store_dtype)
            finals = (W_fin,)
        else:
            n_real = X_full.shape[1]
            n_graph = jax.lax.axis_size(GRAPH_AXIS)
            H1_loc = jax.nn.relu(jnp.einsum("tnf,tfk->tnk", AX_loc, W1s))
            k2 = W0s[1].shape[1]
            # Distributed exact top-k for the layer-2 summaries: local
            # top-k candidates (padding masked to -inf), all-gather the
            # (G, k) candidate values/indices/rows — a few KB — then a
            # global lexsort by (-value, index), which reproduces
            # jax.lax.top_k's lowest-index tie-breaking because every
            # global winner is in its own shard's candidate set.
            p2 = params["cell2"]["p"]
            y_loc = jnp.matmul(H1_loc, p2) / jnp.linalg.norm(p2)  # (T, N_loc)
            shard = jax.lax.axis_index(GRAPH_AXIS)
            gbase = shard * H1_loc.shape[1]
            local_ids = gbase + jax.lax.broadcasted_iota(
                jnp.int32, y_loc.shape, 1
            )
            y_loc = jnp.where(local_ids < n_real, y_loc, -jnp.inf)
            # k candidates per shard, capped by the shard's row count
            # (small graphs on wide meshes: the global pool G*k_loc
            # still covers every global winner as long as k2 <= n_real,
            # the same bound the single-device top_k needs).
            k_loc = min(k2, H1_loc.shape[1])
            top_y, idx = jax.lax.top_k(y_loc, k_loc)  # (T, k_loc)
            cand_rows = jnp.take_along_axis(H1_loc, idx[..., None], axis=1)
            T_ = y_loc.shape[0]
            gather = lambda x: jax.lax.all_gather(x, GRAPH_AXIS, axis=1)
            vals_c = gather(top_y).reshape(T_, n_graph * k_loc)
            ids_c = gather(gbase + idx).reshape(T_, n_graph * k_loc)
            rows_c = gather(cand_rows).reshape(T_, n_graph * k_loc, -1)

            def pick(v, i, r):
                order = jnp.lexsort((i, -v))[:k2]
                return r[order] * v[order][:, None]

            S2 = jax.vmap(pick)(vals_c, ids_c, rows_c)  # (T, k2, F1)
            S2 = jnp.swapaxes(S2, 1, 2)  # (T, F1, k2)

            def stepw2(W2, s):
                W2 = gru_cell(params["cell2"], s, W2)
                return W2, W2

            W2_fin, W2s = jax.lax.scan(stepw2, W0s[1], S2)
            # ONE all-gather of H1 for the batched layer-2 SpMM (the
            # per-step variant gathered the same bytes T times).
            H1_full = jax.lax.all_gather(H1_loc, GRAPH_AXIS, axis=1, tiled=True)
            Z = jax.vmap(
                lambda r, c, v, x: _local_spmm(r, c, v, x, n_local_rows)
            )(rows, cols, vals, H1_full)
            Y = jnp.einsum("tnf,tfk->tnk", Z, W2s).astype(model.store_dtype)
            finals = (W_fin, W2_fin)

        T_loc, N_loc, F = Y.shape
        flat = Y.reshape(T_loc * N_loc, F)
        U = params["U"].astype(flat.dtype)
        logits = readout_partitioned(flat, edges_b, mask, U, n_local_rows)
        return logits[None], finals

    spec_A = P(None, GRAPH_AXIS, None)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(),  # params
            P(),  # W inits (carry)
            spec_A, spec_A, spec_A,  # sharded adjacency
            P(None, GRAPH_AXIS, None),  # cached AX
            P(),  # X replicated (summarize reads full rows)
            P(TIME_AXIS, None, None),  # edge buckets (n_time=1)
            P(TIME_AXIS, None),
        ),
        out_specs=(P(TIME_AXIS, None, None), P()),
        check_vma=False,
    )


def _make_recurrent_sharded_adapter(
    model,
    adj: dict[str, TemporalCOO],
    feats: dict[str, np.ndarray],
    edges: dict[str, np.ndarray],
    mesh: Mesh,
    drop_last_slice: bool,
) -> ModelAdapter:
    n_graph = mesh.shape[GRAPH_AXIS]
    n_time = mesh.shape[TIME_AXIS]
    if n_time != 1:
        raise NotImplementedError(
            "EvolveGCN/WD-GCN recur over time; shard over graph only "
            f"(--mesh {n_graph * n_time}x1), got n_time={n_time}"
        )
    if isinstance(model, EvolveGCN) and model.n_layers not in (1, 2):
        raise NotImplementedError("sharded EvolveGCN supports 1 or 2 layers")

    bundles = {}
    n_local_rows = None
    for w in WINDOWS:
        A, X = adj[w], np.asarray(feats[w])
        if drop_last_slice:
            A = A.slice_window(0, A.n_slices - 1)
            X = X[:-1]
        T = A.n_slices
        A_sh = partition_rows(A, n_graph)
        if w == "train":
            n_local_rows = A_sh.n_local_rows
        e_b, e_mask, e_pos = bucket_edges_by_time(edges[w], T, 1)

        put = jax.device_put
        spec_A = NamedSharding(mesh, P(None, GRAPH_AXIS, None))
        spec_T = NamedSharding(mesh, P(TIME_AXIS, None, None))
        repl = NamedSharding(mesh, P())
        bundles[w] = {
            "rows": put(jnp.asarray(A_sh.rows), spec_A),
            "cols": put(jnp.asarray(A_sh.cols), spec_A),
            # Native dtypes, matching _prepare_bundles: the GRU/LSTM scan
            # carries f32 weights, so promoting X would break the carry.
            "vals": put(jnp.asarray(A_sh.vals), spec_A),
            "X": put(jnp.asarray(X), repl),
            "edges_b": put(jnp.asarray(e_b), spec_T),
            "mask": put(jnp.asarray(e_mask), NamedSharding(mesh, P(TIME_AXIS, None))),
            "pos": put(jnp.asarray(e_pos), repl),
            "n_edges": int(np.asarray(edges[w]).shape[1]),
        }

    propagate = _make_recurrent_propagate(mesh, n_local_rows)
    jit_prop = jax.jit(propagate)
    for b in bundles.values():
        # Parameter-independent A@X, cached sharded (the single-device
        # adapters cache the same — evolvegcn_functions.py:97-101,
        # wd_gcn_functions.py:33).
        b["cached_ax"] = jit_prop(b["rows"], b["cols"], b["vals"], b["X"])

    def init(key):
        return jax.device_put(model.init(key), NamedSharding(mesh, P()))

    if isinstance(model, WDGCN):
        fwd = _make_wdgcn_forward(mesh, n_local_rows, model)

        def apply(variables, bundle, carry):
            stacked = fwd(
                variables["params"],
                variables["buffers"],
                bundle["cached_ax"],
                bundle["edges_b"],
                bundle["mask"],
            )
            return stacked.reshape(-1, stacked.shape[-1])[bundle["pos"]], carry

        return ModelAdapter(init, apply, bundles, lambda variables: ())

    fwd = _make_evolvegcn_forward(mesh, n_local_rows, model)

    def apply(variables, bundle, carry):
        if carry:
            inits = carry
        elif model.n_layers == 2:
            inits = (variables["buffers"]["W_init1"], variables["buffers"]["W_init2"])
        else:
            inits = (variables["buffers"]["W_init1"],)
        stacked, finals = fwd(
            variables["params"],
            inits,
            bundle["rows"],
            bundle["cols"],
            bundle["vals"],
            bundle["cached_ax"],
            bundle["X"],
            bundle["edges_b"],
            bundle["mask"],
        )
        return stacked.reshape(-1, stacked.shape[-1])[bundle["pos"]], finals

    def initial_carry(variables):
        b = variables["buffers"]
        if model.n_layers == 2:
            return (b["W_init1"], b["W_init2"])
        return (b["W_init1"],)

    return ModelAdapter(init, apply, bundles, initial_carry)


# ---------------------------------------------------------------------------
# Regression (SEIR task): (T, N) node-level output. TM-GCN shards over
# (graph x time) exactly like classification — cached banded propagation,
# per-epoch forward is node-local (matmul + linear head, no readout
# collective at all). The recurrent regressors shard over graph. The
# global (T, N) output is reassembled from the contiguous local row
# blocks, so the unmodified run_regression loop (train/loop.py:325)
# trains multi-chip. Capability reference: test_graph_SEIR.py:135-200,
# embedding_help_functions.py:359-423 (single-process CPU).
# ---------------------------------------------------------------------------


def _window_shapes(adj: dict[str, TemporalCOO]) -> tuple[int, int]:
    """(T, N), asserted identical across windows (same_block_size)."""
    shapes = {(adj[w].n_slices, adj[w].n_nodes) for w in WINDOWS}
    if len(shapes) != 1:
        raise NotImplementedError(f"windows differ in shape: {sorted(shapes)}")
    return shapes.pop()


def make_sharded_regression_adapter(
    model,
    adj: dict[str, TemporalCOO],
    feats: dict[str, np.ndarray],
    M: np.ndarray | None,
    mesh: Mesh,
) -> ModelAdapter:
    """Sharded drop-in for tasks.adapters.make_regression_adapter."""
    from tmgcn_tpu.models.evolvegcn import EvolveGCNReg
    from tmgcn_tpu.models.tmgcn import TMGCNReg
    from tmgcn_tpu.models.wdgcn import WDGCNReg, lstm_scan

    n_graph = mesh.shape[GRAPH_AXIS]
    n_time = mesh.shape[TIME_AXIS]
    T, N = _window_shapes(adj)

    def init(key):
        return jax.device_put(model.init(key), NamedSharding(mesh, P()))

    if isinstance(model, TMGCNReg):
        if model.use_Minv or not model.condensed_W:
            raise NotImplementedError(
                "sharded TMGCNReg supports condensed_W without Minv"
            )
        M = np.asarray(M)
        halo = band_offsets(M)[0]
        bundles = {
            w: _prepare_banded_window(
                adj[w], np.asarray(feats[w]), M, mesh, n_graph, n_time, halo
            )[0]
            for w in WINDOWS
        }
        n_local = partition_rows(adj["train"], n_graph).n_local_rows
        sc = _ShardCfg(n_graph, n_time, n_local, halo, 1, "relu", model.dtype)
        jit_prop = jax.jit(_make_propagate(mesh, sc))
        for b in bundles.values():
            b["cached"] = jit_prop(
                b["rows"], b["cols"], b["vals"], b["X"], b["m_blocks"]
            )

        def local(params, H_loc):
            dtype = model.dtype
            H = H_loc.astype(dtype)  # reference f32 buffer truncation
            Y = jnp.matmul(H, params["W"].astype(dtype))
            out = jnp.matmul(Y, params["lin_w"].astype(dtype))
            return out[..., 0] + params["lin_b"].astype(dtype)[0]

        fwd = shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(TIME_AXIS, GRAPH_AXIS, None)),
            out_specs=P(TIME_AXIS, GRAPH_AXIS),
            check_vma=False,
        )

        def apply(variables, bundle, carry):
            return fwd(variables["params"], bundle["cached"])[:T, :N], carry

        return ModelAdapter(init, apply, bundles, lambda variables: ())

    if not isinstance(model, (EvolveGCNReg, WDGCNReg)):
        raise TypeError(f"unsupported regression model: {type(model).__name__}")
    if n_time != 1:
        raise NotImplementedError(
            "EvolveGCNReg/WDGCNReg recur over time; shard over graph only "
            f"(--mesh {n_graph * n_time}x1), got n_time={n_time}"
        )

    bundles = {}
    n_local = None
    for w in WINDOWS:
        A, X = adj[w], np.asarray(feats[w])
        A_sh = partition_rows(A, n_graph)
        if w == "train":
            n_local = A_sh.n_local_rows
        put = jax.device_put
        spec_A = NamedSharding(mesh, P(None, GRAPH_AXIS, None))
        repl = NamedSharding(mesh, P())
        bundles[w] = {
            "rows": put(jnp.asarray(A_sh.rows), spec_A),
            "cols": put(jnp.asarray(A_sh.cols), spec_A),
            # Native dtypes — the f32 GRU/LSTM scan carry (see the edge
            # adapter note above).
            "vals": put(jnp.asarray(A_sh.vals), spec_A),
            "X": put(jnp.asarray(X), repl),
        }

    jit_prop = jax.jit(_make_recurrent_propagate(mesh, n_local))
    for b in bundles.values():
        b["cached_ax"] = jit_prop(b["rows"], b["cols"], b["vals"], b["X"])

    if isinstance(model, WDGCNReg):

        def local(params, buffers, AX_loc):
            AX = AX_loc.astype(model.dtype)
            Y = jax.nn.relu(jnp.matmul(AX, params["W"].astype(AX.dtype)))
            Z = lstm_scan(params["lstm"], buffers["h_init"], buffers["c_init"], Y)
            out = jnp.matmul(Z, params["lin_w"].astype(Z.dtype))
            return out[..., 0] + params["lin_b"].astype(Z.dtype)[0]

        fwd = shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(), P(None, GRAPH_AXIS, None)),
            out_specs=P(None, GRAPH_AXIS),
            check_vma=False,
        )

        def apply(variables, bundle, carry):
            out = fwd(variables["params"], variables["buffers"], bundle["cached_ax"])
            return out[:, :N], carry

        return ModelAdapter(init, apply, bundles, lambda variables: ())

    # EvolveGCNReg: the GRU input summarize(X_t) reads replicated X, so
    # the evolved weights stay replicated without a collective — the
    # staged GRU-only evolution plus one propagation einsum over the
    # shard's cached A@X rows (models/evolvegcn.py).
    from tmgcn_tpu.models.evolvegcn import evolve_weight_stack

    def local(params, W0, AX_loc, X_full):
        _, Ws = evolve_weight_stack(params["cell1"], X_full, W0)
        Y = jnp.einsum("tnf,tfk->tnk", AX_loc, Ws).astype(model.store_dtype)
        out = jnp.matmul(Y, params["lin_w"].astype(Y.dtype))
        return out[..., 0] + params["lin_b"].astype(Y.dtype)[0]

    fwd = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(None, GRAPH_AXIS, None), P()),
        out_specs=P(None, GRAPH_AXIS),
        check_vma=False,
    )

    def apply(variables, bundle, carry):
        W0 = carry[0] if carry else variables["buffers"]["W_init1"]
        out = fwd(variables["params"], W0, bundle["cached_ax"], bundle["X"])
        return out[:, :N], carry

    return ModelAdapter(init, apply, bundles, lambda variables: ())
