"""Model-family adapters: one calling convention across architectures.

Each model family has a different forward signature (TM-GCN takes M,
KWGCN doesn't, EvolveGCN returns evolved weights that must be threaded
train -> val -> test as the reference does in
experiment_bitcoin_evolvegcn.py:132-148). Adapters prepare per-window
*data bundles* (device-resident pytrees) and expose:

    init(key) -> variables
    apply(variables, bundle, carry) -> (output, new_carry)
    bundles[window] -> the pytree for that window

Training loops pass bundles through the jit boundary as arguments —
never closure-capture them — so the adjacency/features stay XLA
*parameters* instead of being baked into the executable as constants
(closure capture makes XLA constant-fold multi-MB graphs at compile
time).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from tmgcn_tpu.core.sparse import TemporalCOO
from tmgcn_tpu.models.evolvegcn import EvolveGCN, EvolveGCNReg
from tmgcn_tpu.models.gcn import KWGCN
from tmgcn_tpu.models.tmgcn import TMGCN, TMGCN2, TMGCNReg
from tmgcn_tpu.models.wdgcn import WDGCN, WDGCNReg

WINDOWS = ("train", "val", "test")


def _cache_edge_rows(bundle: dict, dtype) -> None:
    """Precompute per-edge endpoint rows of the cached propagation.

    Stored TRANSPOSED, (F0, E): with F0 ~ 6 the (E, F0) layout pads the
    128-lane minor dimension ~21x, and reading it as a jit argument
    costs 6.1 ms/epoch at E=772k where the (F0, E) layout costs 0.46 ms
    (lanes fully used by E).
    """
    cached = bundle["cached"].astype(dtype)  # reference f32 buffer truncation
    T, N, F0 = cached.shape
    flat = cached.reshape(T * N, F0)
    e = bundle["edges"]
    bundle["cached_srcT"] = flat[e[0] * N + e[1]].T
    bundle["cached_trgT"] = flat[e[0] * N + e[2]].T


def _fast_edge_logits(W, U, bundle: dict, dtype, readout: str = "concat"):
    """logits = (AtXt_src @ W) @ U_src + (AtXt_trg @ W) @ U_trg.

    Identical math to embed + edge_readout for 1-layer condensed models
    (row selection commutes with the right-matmul by W), computed in the
    transposed edge layout with the tiny W @ U products folded first —
    the epoch touches each (F0, E) endpoint array once. The bilinear
    readout variant multiplies the endpoint embeddings elementwise
    instead (edge_readout_bilinear).
    """
    import jax.numpy as _jnp

    W = W.astype(dtype)
    F1 = W.shape[-1]
    U = U.astype(dtype)
    srcT, trgT = bundle["cached_srcT"], bundle["cached_trgT"]
    if readout == "bilinear":
        sT = _jnp.matmul(W.T, srcT)
        tT = _jnp.matmul(W.T, trgT)
        return _jnp.matmul(U.T, sT * tT).T
    outT = _jnp.matmul((W @ U[:F1]).T, srcT) + _jnp.matmul((W @ U[F1:]).T, trgT)
    return outT.T


def _build_restricted_layer2(
    bundle: dict,
    A: TemporalCOO,
    edges_np: np.ndarray,
    drop_last_slice: bool,
    operator: str = "auto",
    cached_key: str = "cached",
) -> tuple[np.ndarray, np.ndarray]:
    """Restrict the layer-2 propagation to readout-visible rows.

    The edge readout only ever gathers embedding rows at labeled-edge
    endpoints, so the per-epoch layer-2 SpMM A ⊛ Y only needs the output
    rows in that endpoint set — on chess that is ~14% of the nonzeros
    (the reference computes all N rows every epoch,
    embedding_help_functions.py:301-312,348-349). BOTH index spaces are
    compacted host-side: outputs to the unique endpoint rows (~3.5% of
    T*N on chess) and inputs to their unique in-neighbors (~15%), so the
    per-epoch gathers, segment reductions AND the layer-1 matmul touch
    only small dense matrices — layer-1 runs on `l2_Hin` (the cached
    propagation gathered once at build time at the used rows; rows
    outside the in-neighborhood have zero cotangent, so dW1 is
    unchanged). The epoch-time operator is rectangular
    (endpoints x used); the readout gathers straight from compact rows.
    """
    from tmgcn_tpu.ops.spmm_rowsplit import flatten_stream, make_flat_operator

    if drop_last_slice:
        A = A.slice_window(0, A.n_slices - 1)
    T, N = A.n_slices, A.n_nodes
    e = np.asarray(edges_np, np.int64)
    src_keys = e[0] * N + e[1]
    trg_keys = e[0] * N + e[2]
    uniq = np.unique(np.concatenate([src_keys, trg_keys]))
    g_rows, g_cols, g_vals = flatten_stream(A)
    idx = np.searchsorted(uniq, g_rows)
    idx = np.minimum(idx, len(uniq) - 1)
    member = uniq[idx] == g_rows
    used = np.unique(g_cols[member])
    rows_c = idx[member]
    cols_c = np.searchsorted(used, g_cols[member])
    vals_c = g_vals[member]
    if operator in ("auto", "auto_bf16"):
        # On TPU, prefer the block-dense operator: the restricted
        # stream is block-local (node ids ordered by appearance, banded
        # M), and dense MXU tiles beat the Pallas kernel's random-row
        # gather 3x when the block tensor moves fewer bytes than the
        # tile-gather floor (spmm_blockdense module docstring). Fall
        # back to the windowed Pallas kernel for block-hostile
        # patterns. Off-TPU the rowsplit gather/segment operator keeps
        # the CPU test path in native XLA. "auto_bf16" selects the
        # production-fast precision class of whichever operator wins.
        bf = "_bf16" if operator.endswith("bf16") else ""
        if jax.default_backend() == "tpu":
            from tmgcn_tpu.ops.spmm_blockdense import estimate

            est = estimate(rows_c, cols_c, itemsize=2 if bf else 4)
            # ratio < 0.5, not 1.0: the margin absorbs the block path's
            # unmodeled costs (see ops/spmm.make_auto_operator).
            operator = ("blockdense" if est["ratio"] < 0.5 else "pallas") + bf
        else:
            operator = "rowsplit"
    op = None
    if operator in ("blockdense", "blockdense_bf16"):
        from tmgcn_tpu.ops.spmm_blockdense import make_flat_operator as mk_bd

        try:
            op = mk_bd(
                rows_c, cols_c, vals_c,
                n_in=len(used), n_out=len(uniq),
                mode="bf16" if operator.endswith("bf16") else "exact",
            )
        except ValueError:
            # Over the block-tensor byte budget; keep the requested
            # precision class in the fallback.
            operator = "pallas_bf16" if operator.endswith("bf16") else "pallas"
    if op is None and operator in ("pallas", "pallas_bf16"):
        from tmgcn_tpu.kernels.spmm_pallas import make_flat_operator as mk_pallas

        op = mk_pallas(
            rows_c, cols_c, vals_c,
            n_in=len(used), n_out=len(uniq), chunk=512, window=256,
            sort_cols=True,
            gather_dtype="bfloat16" if operator == "pallas_bf16" else None,
        )
    if op is None:
        op = make_flat_operator(
            rows_c, cols_c, vals_c,
            n_in=len(used), n_out=len(uniq), k=4,
        )
    bundle["l2op"] = jax.device_put(op)
    # One build-time device gather: the cached propagation at used rows.
    F0 = bundle[cached_key].shape[-1]
    bundle["l2_Hin"] = bundle[cached_key].reshape(T * N, F0)[
        jnp.asarray(used, jnp.int32)
    ]
    bundle["l2_src"] = jax.device_put(
        jnp.asarray(np.searchsorted(uniq, src_keys), jnp.int32)
    )
    bundle["l2_trg"] = jax.device_put(
        jnp.asarray(np.searchsorted(uniq, trg_keys), jnp.int32)
    )
    return uniq, used


def _pad_packed_chunks(p, j_max):
    """Pad a PackedSpmm's chunk axis to j_max with inert chunks.

    Padding chunks carry zero vals (contribute nothing), window_id 0 and
    is_first 0 (accumulate +0 into an already-initialized window), so
    packings of different chunk counts stack into one scan operand.
    """
    import dataclasses as _dc

    import jax.numpy as _jnp

    j = p.rows.shape[0]
    if j == j_max:
        return p
    pad = j_max - j
    z2 = _jnp.zeros((pad, p.rows.shape[1]), p.rows.dtype)
    return _dc.replace(
        p,
        rows=_jnp.concatenate([p.rows, z2]),
        cols=_jnp.concatenate([p.cols, z2]),
        vals=_jnp.concatenate([p.vals, _jnp.zeros((pad, p.vals.shape[1]), p.vals.dtype)]),
        window_id=_jnp.concatenate([p.window_id, _jnp.zeros(pad, p.window_id.dtype)]),
        is_first=_jnp.concatenate([p.is_first, _jnp.zeros(pad, p.is_first.dtype)]),
    )


def _build_streamed_layer2(
    bundle: dict,
    A,
    edges_np: np.ndarray,
    drop_last_slice: bool,
    n_chunks: int,
    operator: str = "auto",
    cached_key: str = "cached",
) -> None:
    """Time-chunked variant of the restricted layer-2 build (HBM streaming).

    The single restricted operator materializes its whole gathered chunk
    stream per epoch (J_total x C x F1 plus the transposed backward) —
    at 1M nodes that transient is what exhausts single-chip HBM
    (results/stream2_probe.jsonl). This build splits the T slices into
    ``n_chunks`` groups and packs ONE rectangular Pallas operator per
    group with SHARED padded shapes (n_out=U_pad endpoint rows,
    n_in=S_max in-neighbor rows, chunk count J_max), so the epoch runs a
    ``lax.scan`` over the stacked operator pytree: HBM holds one group's
    gather stream at a time, trading wall time for peak memory — the
    slow-but-finite alternative to a declared OOM (the reference
    computes all N rows every epoch, embedding_help_functions.py:301-312).

    Produces bundle keys: ``l2s_op`` (stacked FlatPallasOperator),
    ``l2s_Hin`` (n_chunks, S_max, F0), ``l2s_src``/``l2s_trg`` (E,)
    indices into the (n_chunks * U_pad, F1) stacked output.
    """
    from tmgcn_tpu.kernels.spmm_pallas import make_flat_operator as mk_pallas
    from tmgcn_tpu.ops.spmm_rowsplit import flatten_stream

    if drop_last_slice:
        A = A.slice_window(0, A.n_slices - 1)
    T, N = A.n_slices, A.n_nodes
    t_per = -(-T // n_chunks)  # ceil
    e = np.asarray(edges_np, np.int64)
    src_keys = e[0] * N + e[1]
    trg_keys = e[0] * N + e[2]
    edge_chunk = e[0] // t_per
    g_rows, g_cols, g_vals = flatten_stream(A)
    row_chunk = (g_rows // N) // t_per

    bf16 = operator.endswith("bf16")
    gather_dtype = "bfloat16" if bf16 else None

    chunks = []
    for c in range(n_chunks):
        esel = edge_chunk == c
        uniq_c = np.unique(np.concatenate([src_keys[esel], trg_keys[esel]]))
        asel = row_chunk == c
        rows_a, cols_a, vals_a = g_rows[asel], g_cols[asel], g_vals[asel]
        idx = np.searchsorted(uniq_c, rows_a)
        idx = np.minimum(idx, max(len(uniq_c) - 1, 0))
        member = (uniq_c[idx] == rows_a) if len(uniq_c) else np.zeros(0, bool)
        used_c = np.unique(cols_a[member])
        chunks.append((
            uniq_c, used_c,
            idx[member],                                  # local rows
            np.searchsorted(used_c, cols_a[member]),      # local cols
            vals_a[member],
        ))

    U_pad = max(len(c[0]) for c in chunks)
    S_max = max(max(len(c[1]) for c in chunks), 1)
    ops = [
        mk_pallas(
            r, cc, v, n_in=S_max, n_out=U_pad, chunk=512, window=256,
            sort_cols=True, gather_dtype=gather_dtype,
        )
        for (_, _, r, cc, v) in chunks
    ]
    j_max = max(op.packed.rows.shape[0] for op in ops)
    jt_max = max(op.packed_t.rows.shape[0] for op in ops)
    import dataclasses as _dc

    ops = [
        _dc.replace(
            op,
            packed=_pad_packed_chunks(op.packed, j_max),
            packed_t=_pad_packed_chunks(op.packed_t, jt_max),
        )
        for op in ops
    ]
    bundle["l2s_op"] = jax.device_put(
        jax.tree.map(lambda *xs: jnp.stack(xs), *ops)
    )

    F0 = bundle[cached_key].shape[-1]
    flat_cached = bundle[cached_key].reshape(T * N, F0)
    hin = np.zeros((n_chunks, S_max), np.int64)
    for c, (_, used_c, *_rest) in enumerate(chunks):
        hin[c, : len(used_c)] = used_c
    bundle["l2s_Hin"] = flat_cached[jnp.asarray(hin.reshape(-1), jnp.int32)].reshape(
        n_chunks, S_max, F0
    )

    def to_stream(keys):
        out = np.zeros(len(keys), np.int64)
        for c, (uniq_c, *_rest) in enumerate(chunks):
            sel = edge_chunk == c
            out[sel] = c * U_pad + np.searchsorted(uniq_c, keys[sel])
        return out

    bundle["l2s_src"] = jax.device_put(jnp.asarray(to_stream(src_keys), jnp.int32))
    bundle["l2s_trg"] = jax.device_put(jnp.asarray(to_stream(trg_keys), jnp.int32))


def _readout_fn(bundle: dict):
    """Bind a bundle's ReadoutPlan (if any) into an op(Y, U) callable."""
    if "readout" not in bundle:
        return None
    from tmgcn_tpu.ops.edge_readout import apply_readout

    plan = bundle["readout"]
    return lambda Y, U: apply_readout(plan, Y, U)


@dataclasses.dataclass
class ModelAdapter:
    """Uniform (variables, bundle, carry) -> (output, carry) interface."""

    init: Callable[[jax.Array], dict]
    apply: Callable[[dict, dict, Any], tuple[jax.Array, Any]]
    bundles: dict[str, dict]
    initial_carry: Callable[[dict], Any]
    # Optional collective-light training statistics:
    # (variables, bundle, tgt, cw, logit_transform) -> (loss, (tp, fp, fn)).
    # Sharded adapters implement it so non-eval epochs reduce the loss
    # and confusion counts to scalar psums on SHARDED logits instead of
    # all-gathering the (E, C) logit tensor — the eval-step asymptotic
    # cap identified by utils/comm_model.py. None -> the loops use
    # ``apply`` for everything (single-device behavior unchanged).
    train_stats: Callable | None = None

    def logits(self, variables: dict, window: str, carry: Any = ()) -> tuple[jax.Array, Any]:
        """Eager convenience: apply on a named window's bundle."""
        return self.apply(variables, self.bundles[window], carry)


OPERATOR_IMPLS = (
    "pallas", "pallas_bf16", "rowsplit", "blockdense", "blockdense_bf16",
    "auto", "auto_bf16",
)


def _prepare_bundles(
    adj: dict[str, TemporalCOO],
    feats: dict[str, Any],
    edges: dict[str, np.ndarray] | None,
    M: np.ndarray | None,
    drop_last_slice: bool,
    spmm_operator: str | None = None,
) -> dict[str, dict]:
    bundles = {}
    # Windows that share the SAME adjacency/features/edges objects
    # (common in benchmarks: {w: A for w in WINDOWS}) get ONE device
    # copy — device_put of identical host arrays three times would
    # triple device memory (the 300k-node scale-bench OOM).
    seen: dict[tuple, str] = {}
    for w in WINDOWS:
        key = (
            id(adj[w]), id(feats[w]),
            id(edges[w]) if edges is not None else None,
        )
        if key in seen:
            bundles[w] = bundles[seen[key]]
            continue
        seen[key] = w
        A, X = adj[w], np.asarray(feats[w])
        if drop_last_slice:
            A = A.slice_window(0, A.n_slices - 1)
            X = X[:-1]
        n_slices, n_nodes = A.n_slices, A.n_nodes
        if spmm_operator == "pallas":
            # Prepack the TPU kernel's scatter plan once, host-side.
            from tmgcn_tpu.kernels.spmm_pallas import make_operator

            A = make_operator(A)
        elif spmm_operator == "pallas_bf16":
            # Production-fast kernel: bf16 gather traffic, f32 window
            # accumulation, column-sorted chunks (kernel_probe.py).
            from tmgcn_tpu.kernels.spmm_pallas import make_operator

            A = make_operator(
                A, chunk=512, window=256, gather_dtype="bfloat16",
                sort_cols=True,
            )
        elif spmm_operator in ("blockdense", "blockdense_bf16"):
            # Dense MXU tiles over the block-local nonzero pattern —
            # sequential DMA instead of random row gathers
            # (ops/spmm_blockdense.py).
            from tmgcn_tpu.ops.spmm_blockdense import make_operator

            A = make_operator(
                A, mode="bf16" if spmm_operator.endswith("bf16") else "exact"
            )
        elif spmm_operator in ("auto", "auto_bf16"):
            # Byte-model auto-selection for the full-row path
            # (ops/spmm.make_auto_operator): block-dense when its block
            # tensor beats the tile-gather floor, else windowed Pallas;
            # unpacked off-TPU.
            from tmgcn_tpu.ops.spmm import make_auto_operator

            A = make_auto_operator(A, bf16=spmm_operator.endswith("bf16"))
        elif spmm_operator == "rowsplit":
            from tmgcn_tpu.ops.spmm_rowsplit import make_operator

            A = make_operator(A)
        bundle = {"adj": A, "X": jnp.asarray(X)}
        if edges is not None:
            bundle["edges"] = jnp.asarray(np.asarray(edges[w]), dtype=jnp.int32)
            # Fast readout backward through the windowed kernel: the
            # autodiff transpose of the endpoint gather is a serialized
            # XLA scatter (~50 ns/row — ~4 ms/epoch at chess edge
            # counts), so on TPU every edge model gets the prepacked
            # plan. Off-TPU only operator-backed configs build it (the
            # interpreted kernel is slow; XLA CPU scatters are fine).
            # At very large T*N the plan auto-switches to the
            # lane-major backward kernel (make_readout_plan lane_major
            # auto): the standard kernel's (T*N, F~6) cotangent in
            # Mosaic's (8,128)-tiled layout pads 21x — 15 GB at 32M
            # rows, the measured 500k-node recurrent OOM
            # (results/recurrent_compile_boundary.md).
            if spmm_operator is not None or jax.default_backend() == "tpu":
                from tmgcn_tpu.ops.edge_readout import make_readout_plan

                bundle["readout"] = make_readout_plan(
                    np.asarray(edges[w]), n_slices, n_nodes
                )
        if M is not None:
            Mw = np.asarray(M)
            if drop_last_slice:
                Mw = Mw[:-1, :-1]
            bundle["M"] = jnp.asarray(Mw, dtype=bundle["X"].dtype)
        # One up-front transfer; training loops reuse the device copies.
        bundles[w] = jax.device_put(bundle)
    return bundles


def _unique_bundles(bundles: dict[str, dict]):
    """Each distinct bundle dict once (windows may share one, see
    _prepare_bundles dedupe) — cache fills must not run 3x on it."""
    seen: set[int] = set()
    for b in bundles.values():
        if id(b) not in seen:
            seen.add(id(b))
            yield b


def make_edge_adapter(
    model,
    adj: dict[str, TemporalCOO],
    feats: dict[str, Any],
    edges: dict[str, np.ndarray],
    M: np.ndarray | None = None,
    drop_last_slice: bool = False,
    l2_stream_chunks: int | None = None,
) -> ModelAdapter:
    """Adapter for edge-output models on prepared windows.

    Args:
        model: a TMGCN/TMGCN2/KWGCN/EvolveGCN/WDGCN instance.
        adj: per-window adjacency (Ct for TM-GCN, C for baselines).
        feats: per-window (T, N, F) features.
        edges: per-window (3, E) model-input edges.
        M: mixing matrix (TM-GCN families only).
        drop_last_slice: link-prediction convention — the model consumes
            slices [0, T-1) and M[:-1, :-1].
        l2_stream_chunks: TMGCN2 restricted path only — stream the
            layer-2 propagation as a lax.scan over this many time-chunk
            operators so HBM holds one chunk's gather stream at a time
            (the 1M-node single-chip configuration; see
            _build_streamed_layer2). None = single operator.
    """
    impl = getattr(model, "spmm_impl", "jnp")
    spmm_operator = (
        impl
        if impl in OPERATOR_IMPLS
        and isinstance(model, (TMGCN, TMGCN2, KWGCN, WDGCN))
        else None
    )
    restricted2 = (
        isinstance(model, TMGCN2)
        and model.condensed_W
        and not model.use_Minv
        and not model.apply_M_twice
    )
    if restricted2:
        # The restricted path runs the square operator exactly once (the
        # cached layer-1 propagation), so prepacking it would be pure
        # build cost; the impl choice goes to the restricted layer-2
        # operator instead.
        spmm_operator = None
    bundles = _prepare_bundles(adj, feats, edges, M, drop_last_slice, spmm_operator)

    if isinstance(model, (TMGCN, TMGCN2)):
        # Cache the parameter-independent first-layer propagation, as the
        # reference does at model init (embedding_help_functions.py:195):
        # training epochs then run no SpMM at all for 1-layer TM-GCN.
        for b in _unique_bundles(bundles):
            b["cached"] = model.propagate(b["adj"], b["X"], b["M"])

        # Gather-free fast path for 1-layer condensed TM-GCN (the config
        # every reference experiment uses): row selection commutes with
        # the weight matmul, so the per-edge endpoint rows of AtXt are
        # precomputed once and a training epoch is pure matmul — no
        # gather in the forward, no scatter in the backward.
        if isinstance(model, TMGCN) and model.condensed_W and not model.use_Minv:
            for b in _unique_bundles(bundles):
                _cache_edge_rows(b, model.dtype)

            def apply(variables, bundle, carry):
                return _fast_edge_logits(
                    variables["params"]["W"], variables["params"]["U"], bundle,
                    model.dtype, model.readout,
                ), carry

            return ModelAdapter(model.init, apply, bundles, lambda variables: ())

        if restricted2 and l2_stream_chunks:
            from tmgcn_tpu.models.common import nonlinearity

            done_s: set[int] = set()
            for w in WINDOWS:
                if id(bundles[w]) in done_s:
                    continue
                done_s.add(id(bundles[w]))
                _build_streamed_layer2(
                    bundles[w], adj[w], np.asarray(edges[w]), drop_last_slice,
                    n_chunks=l2_stream_chunks,
                    operator=impl if impl in OPERATOR_IMPLS else "auto",
                )

            def apply(variables, bundle, carry):
                p = variables["params"]
                dtype = model.dtype
                nl = nonlinearity(model.nonlin2)
                W1 = p["W1"]

                def step(_, xs):
                    op_c, H_c = xs
                    H_c = H_c.astype(dtype)
                    Y = nl(jnp.matmul(H_c, W1.astype(H_c.dtype)))
                    if model.interlayer_dtype is not None:
                        Y = Y.astype(model.interlayer_dtype)
                    return None, op_c(Y).astype(dtype)

                _, Z = jax.lax.scan(
                    step, None, (bundle["l2s_op"], bundle["l2s_Hin"])
                )
                Zc = Z.reshape(-1, Z.shape[-1])
                W2 = p["W2"].astype(dtype)
                F2 = W2.shape[-1]
                U = p["U"].astype(dtype)
                P1 = jnp.matmul(Zc, W2 @ U[:F2])
                P2 = jnp.matmul(Zc, W2 @ U[F2:])
                logits = P1[bundle["l2s_src"]] + P2[bundle["l2s_trg"]]
                return logits, carry

            return ModelAdapter(model.init, apply, bundles, lambda variables: ())

        if restricted2:
            # Readout-restricted layer 2: the per-epoch SpMM computes
            # only endpoint rows (identical math — row selection of the
            # readout commutes with layer-2's SpMM output). The model's
            # spmm_impl picks the restricted operator; "jnp" = auto.
            from tmgcn_tpu.models.common import nonlinearity

            done: set[int] = set()
            for w in WINDOWS:
                # Shared (deduped) bundles imply identical adj/edges —
                # build the restricted operator once per distinct bundle.
                if id(bundles[w]) in done:
                    continue
                done.add(id(bundles[w]))
                _build_restricted_layer2(
                    bundles[w], adj[w], np.asarray(edges[w]), drop_last_slice,
                    operator=impl if impl in OPERATOR_IMPLS else "auto",
                )

            def apply(variables, bundle, carry):
                p = variables["params"]
                dtype = model.dtype
                H = bundle["l2_Hin"].astype(dtype)  # (n_used, F0) compact
                Y = jnp.matmul(H, p["W1"].astype(H.dtype))
                Y = nonlinearity(model.nonlin2)(Y)
                if model.interlayer_dtype is not None:
                    Y = Y.astype(model.interlayer_dtype)
                Zc = bundle["l2op"](Y).astype(dtype)
                # Fold W2 @ U before the per-edge gathers: the tiny
                # (F1, C) products run on n_uniq rows instead of E, and
                # the gathered width drops to C.
                W2 = p["W2"].astype(dtype)
                F2 = W2.shape[-1]
                U = p["U"].astype(dtype)
                P1 = jnp.matmul(Zc, W2 @ U[:F2])
                P2 = jnp.matmul(Zc, W2 @ U[F2:])
                logits = P1[bundle["l2_src"]] + P2[bundle["l2_trg"]]
                return logits, carry

            return ModelAdapter(model.init, apply, bundles, lambda variables: ())

        def apply(variables, bundle, carry):
            out = model.apply(
                variables,
                bundle["adj"],
                bundle["X"],
                bundle["edges"],
                bundle["M"],
                bundle["cached"],
                readout_op=_readout_fn(bundle),
            )
            return out, carry

        return ModelAdapter(model.init, apply, bundles, lambda variables: ())

    if isinstance(model, (KWGCN, WDGCN)):
        for b in _unique_bundles(bundles):
            b["cached"] = model.propagate(b["adj"], b["X"])

        if isinstance(model, KWGCN) and model.n_layers == 1:
            for b in _unique_bundles(bundles):
                _cache_edge_rows(b, model.dtype)

            def apply(variables, bundle, carry):
                return _fast_edge_logits(
                    variables["params"]["W1"], variables["params"]["U"], bundle, model.dtype
                ), carry

            return ModelAdapter(model.init, apply, bundles, lambda variables: ())

        if isinstance(model, WDGCN):
            # Transposed (T, F0, N) cache: the whole WD-GCN forward then
            # runs lane-major (see models/wdgcn.lstm_scan_t).
            for b in _unique_bundles(bundles):
                b["cached_t"] = jnp.swapaxes(b["cached"], 1, 2)

            def apply(variables, bundle, carry):
                out = model.apply(
                    variables,
                    bundle["adj"],
                    bundle["X"],
                    bundle["edges"],
                    readout_op=_readout_fn(bundle),
                    AXt=bundle["cached_t"],
                )
                return out, carry

            return ModelAdapter(model.init, apply, bundles, lambda variables: ())

        def apply(variables, bundle, carry):
            out = model.apply(
                variables,
                bundle["adj"],
                bundle["X"],
                bundle["edges"],
                bundle["cached"],
                readout_op=_readout_fn(bundle),
            )
            return out, carry

        return ModelAdapter(model.init, apply, bundles, lambda variables: ())

    if isinstance(model, EvolveGCN):
        # Layer-1 propagation is parameter-independent: cache A@X so the
        # evolved-weight scan keeps only parameter-dependent SpMMs
        # (none for 1-layer; layer-2 only for 2-layer).
        for b in _unique_bundles(bundles):
            b["cached_ax"] = model.propagate(b["adj"], b["X"])

        onehot_bytes = max(
            b["cached_ax"].shape[0] * np.asarray(edges[w]).shape[1] * 4
            for w, b in bundles.items()
        )
        if (
            model.n_layers == 1
            and model.store_dtype == model.dtype
            # The (T, E) slice one-hot is worth it until it rivals the
            # tensors the fast path avoids (LP's 20x-augmented edge sets
            # at full T would be ~100s of MB; the readout-plan generic
            # path wins there).
            and onehot_bytes <= 128 << 20
        ):
            # Gather-free fast path (the commutation trick of the TM-GCN
            # 1-layer path, extended to per-slice weights): logits[e] =
            # ax_src[e] @ (W_{t_e} @ U_src) + ax_trg[e] @ (W_{t_e} @
            # U_trg), so an epoch needs only the GRU-only weight scan,
            # two (C*F0, T) x (T, E) one-hot matmuls mapping slice
            # weights to edges, and a lane-dense elementwise contraction
            # over F0 — no (T, N, F1) embedding tensor, no gathers, no
            # scatters. Skipped when store_dtype != dtype (the
            # reference's f32-buffer truncation happens between the W
            # and U contractions and cannot commute).
            done: set[int] = set()
            for w in WINDOWS:
                b = bundles[w]
                if id(b) in done:  # deduped shared window
                    continue
                done.add(id(b))
                ax = b["cached_ax"]
                T_, N_, F0_ = ax.shape
                e = np.asarray(edges[w], np.int64)
                flat = ax.reshape(T_ * N_, F0_)
                b["ax_srcT"] = flat[jnp.asarray(e[0] * N_ + e[1])].T
                b["ax_trgT"] = flat[jnp.asarray(e[0] * N_ + e[2])].T
                oh = np.zeros((T_, e.shape[1]), np.float32)
                oh[e[0], np.arange(e.shape[1])] = 1.0
                b["edge_slice_ohT"] = jax.device_put(jnp.asarray(oh))

            def apply(variables, bundle, carry):
                p = variables["params"]
                W0 = carry[0] if carry else variables["buffers"]["W_init1"]
                W_fin, Ws = model.evolved_weights(variables, bundle["X"], W0)
                dtype = model.dtype
                U = p["U"].astype(dtype)
                F1 = Ws.shape[-1]
                Ws = Ws.astype(dtype)
                Wsrc = jnp.einsum("tfk,kc->cft", Ws, U[:F1])
                Wtrg = jnp.einsum("tfk,kc->cft", Ws, U[F1:])
                C, F0m, T_ = Wsrc.shape
                oh = bundle["edge_slice_ohT"]
                We_s = (Wsrc.reshape(C * F0m, T_) @ oh).reshape(C, F0m, -1)
                We_t = (Wtrg.reshape(C * F0m, T_) @ oh).reshape(C, F0m, -1)
                logitsT = (We_s * bundle["ax_srcT"][None]).sum(1)
                logitsT = logitsT + (We_t * bundle["ax_trgT"][None]).sum(1)
                return logitsT.T, (W_fin,)

            def initial_carry(variables):
                return (variables["buffers"]["W_init1"],)

            return ModelAdapter(model.init, apply, bundles, initial_carry)

        restricted_e2 = model.n_layers == 2 and model.store_dtype == model.dtype
        if restricted_e2:
            # Probe the one-hot budget before building anything: the
            # per-slice weight application needs (T, n_used) + (T, n_uniq)
            # one-hot operands per window (n_used <= nnz is the cheap
            # upper bound without flattening the stream; LP's 20x
            # augmented edge sets blow this budget and keep the generic
            # staged path).
            oh_bytes = 0
            for w in WINDOWS:
                A = adj[w]
                T_ = A.n_slices - (1 if drop_last_slice else 0)
                e = np.asarray(edges[w], np.int64)
                keys = np.concatenate([e[0] * A.n_nodes + e[1], e[0] * A.n_nodes + e[2]])
                n_uniq = len(np.unique(keys))
                n_used_bound = min(T_ * A.n_nodes, int(np.asarray(A.vals).size))
                oh_bytes = max(oh_bytes, T_ * (n_uniq + n_used_bound) * 4)
            restricted_e2 = oh_bytes <= 256 << 20

        if restricted_e2:
            # Readout-restricted layer 2 with per-slice EVOLVED weights:
            # the staged forward (GRU-only scans + batched einsums) keeps
            # one full-row per-epoch SpMM, A ⊛ H1 — by far the dominant
            # cost (~470 of ~472 ms/epoch on chess). Row selection of the
            # readout commutes with that SpMM, so the rectangular
            # restricted operator computes only endpoint rows, exactly as
            # the TMGCN2 restricted path — but here W1/W2 differ per
            # slice, so they are applied row-wise through (T, n_rows)
            # one-hot MXU matmuls (the proven 1-layer trick; row blocks
            # are slice-sorted). H1 still materializes fully ONCE per
            # epoch (a batched einsum, no SpMM) because the layer-2 top-k
            # summaries score all N nodes (evolvegcn_functions.py:180-188).
            from tmgcn_tpu.models.evolvegcn import evolve_weight_stack

            built: dict[int, dict] = {}
            for w in WINDOWS:
                b = bundles[w]
                if id(b) in built:  # deduped shared window
                    bundles[w] = built[id(b)]
                    continue
                key = id(b)
                uniq, used = _build_restricted_layer2(
                    b, adj[w], np.asarray(edges[w]), drop_last_slice,
                    operator="auto", cached_key="cached_ax",
                )
                T_, N_ = b["cached_ax"].shape[:2]
                # (F0, n_used) transposed input rows of the cached A@X.
                b["l2_HinT"] = b["l2_Hin"].T
                for name, keys in (("used", used), ("uniq", uniq)):
                    oh = np.zeros((T_, len(keys)), np.float32)
                    oh[keys // N_, np.arange(len(keys))] = 1.0
                    b[f"l2_{name}_ohT"] = jax.device_put(jnp.asarray(oh))
                # device_put re-creates the dict: point every window that
                # shared the host dict at the SAME device copy.
                built[key] = bundles[w] = jax.device_put(b)

            def apply(variables, bundle, carry):
                p = variables["params"]
                b_init = variables["buffers"]
                W0 = carry[0] if carry else b_init["W_init1"]
                W20 = carry[1] if carry else b_init["W_init2"]
                dtype = model.dtype
                AX = bundle["cached_ax"]
                # GRU-only weight evolutions (batched summaries).
                W_fin, W1s = evolve_weight_stack(p["cell1"], bundle["X"], W0)
                # einsum promotes like the staged path's per-step matmul.
                H1 = jax.nn.relu(jnp.einsum("tnf,tfk->tnk", AX, W1s))
                W2_fin, W2s = evolve_weight_stack(p["cell2"], H1, W20)
                # Layer-1 at the used input rows, per-row slice weights:
                # Wrow[f, k, u] = W1s[t_u, f, k] via one-hot matmul.
                W1s = W1s.astype(dtype)
                F0_, F1_ = W1s.shape[1], W1s.shape[2]
                oh_used = bundle["l2_used_ohT"]
                Wrow = (
                    jnp.transpose(W1s, (1, 2, 0)).reshape(F0_ * F1_, -1) @ oh_used
                ).reshape(F0_, F1_, -1)
                HinT = bundle["l2_HinT"].astype(dtype)
                H1uT = jax.nn.relu((Wrow * HinT[:, None, :]).sum(0))
                # The restricted rectangular SpMM (endpoint rows only).
                Zc = bundle["l2op"](H1uT.T).astype(dtype)
                # Fold W2_t @ U before the per-edge gathers, per-slice.
                U = p["U"].astype(dtype)
                W2s = W2s.astype(dtype)
                F2_ = W2s.shape[-1]
                oh_uniq = bundle["l2_uniq_ohT"]
                ZcT = Zc.T
                logitsT = 0.0
                for Upart, idx in (
                    (U[:F2_], bundle["l2_src"]),
                    (U[F2_:], bundle["l2_trg"]),
                ):
                    WU = jnp.einsum("tfk,kc->fct", W2s, Upart)
                    F1b, C_ = WU.shape[0], WU.shape[1]
                    Wu = (WU.reshape(F1b * C_, -1) @ oh_uniq).reshape(F1b, C_, -1)
                    P = (Wu * ZcT[:, None, :]).sum(0)  # (C, n_uniq)
                    logitsT = logitsT + P[:, idx]
                return logitsT.T, (W_fin, W2_fin)

            def initial_carry(variables):
                b = variables["buffers"]
                return (b["W_init1"], b["W_init2"])

            return ModelAdapter(model.init, apply, bundles, initial_carry)

        def apply(variables, bundle, carry):
            inits = carry if carry else ()
            out, finals = model.apply(
                variables,
                bundle["adj"],
                bundle["X"],
                bundle["edges"],
                *inits,
                AX=bundle.get("cached_ax"),
                readout_op=_readout_fn(bundle),
            )
            return out, finals

        def initial_carry(variables):
            b = variables["buffers"]
            if model.n_layers == 2:
                return (b["W_init1"], b["W_init2"])
            return (b["W_init1"],)

        return ModelAdapter(model.init, apply, bundles, initial_carry)

    raise TypeError(f"unsupported edge model: {type(model).__name__}")


def make_regression_adapter(
    model,
    adj: dict[str, TemporalCOO],
    feats: dict[str, Any],
    M: np.ndarray | None = None,
) -> ModelAdapter:
    """Adapter for (T, N) regression models (SEIR task)."""
    needs_m = isinstance(model, TMGCNReg)
    impl = getattr(model, "spmm_impl", "jnp")
    spmm_operator = (
        impl
        if impl in OPERATOR_IMPLS and isinstance(model, (TMGCNReg, WDGCNReg))
        else None
    )
    bundles = _prepare_bundles(
        adj, feats, None, M if needs_m else None, False, spmm_operator
    )

    if isinstance(model, TMGCNReg):
        for b in _unique_bundles(bundles):
            b["cached"] = model.propagate(b["adj"], b["X"], b["M"])

        def apply(variables, bundle, carry):
            return (
                model.apply(
                    variables, bundle["adj"], bundle["X"], bundle["M"], bundle["cached"]
                ),
                carry,
            )

    elif isinstance(model, EvolveGCNReg):
        # Cache the parameter-independent A@X (as the classifier adapter
        # does) so the evolved-weight scan runs no SpMM.
        for b in _unique_bundles(bundles):
            b["cached_ax"] = model.propagate(b["adj"], b["X"])

        def apply(variables, bundle, carry):
            W0 = carry[0] if carry else None
            return (
                model.apply(
                    variables, bundle["adj"], bundle["X"], W0,
                    AX=bundle.get("cached_ax"),
                ),
                carry,
            )

    elif isinstance(model, WDGCNReg):

        def apply(variables, bundle, carry):
            return model.apply(variables, bundle["adj"], bundle["X"]), carry

    else:
        raise TypeError(f"unsupported regression model: {type(model).__name__}")

    return ModelAdapter(model.init, apply, bundles, lambda variables: ())
