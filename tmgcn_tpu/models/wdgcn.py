"""WD-GCN: one GCN layer followed by a per-node LSTM over time.

One per-slice graph convolution produces (T, N, F1) embeddings; a single
LSTM cell with weights shared across nodes then scans the time axis
(``lax.scan``, nodes batched on the leading matmul dimension).

Capability reference: IBM/TM-GCN TensorGCN-master/wd_gcn_functions.py —
WD_GCN :21-98, WD_GCN_reg :100-169. Two reference quirks reproduced for
parity: the candidate cell state uses a *sigmoid* (not tanh,
wd_gcn_functions.py:94), and the edge-readout matrix U is a frozen random
tensor, never trained (:55) — it lives in ``buffers`` here. The LSTM
initial states h/c are likewise frozen random buffers.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tmgcn_tpu.core.sparse import TemporalCOO
from tmgcn_tpu.models.common import randn, split_dict
from tmgcn_tpu.ops.edge_readout import edge_readout
from tmgcn_tpu.ops.spmm import spmm


def _init_lstm(key: jax.Array, f: int, dtype) -> tuple[dict, dict]:
    names = [f"{w}{g}" for w in ("W", "U") for g in "fjco"] + [f"b{g}" for g in "fjco"]
    k = split_dict(key, names + ["h_init", "c_init"])
    params = {}
    for g in "fjco":
        params[f"W{g}"] = randn(k[f"W{g}"], (f, f), dtype)
        params[f"U{g}"] = randn(k[f"U{g}"], (f, f), dtype)
        params[f"b{g}"] = randn(k[f"b{g}"], (f,), dtype)
    buffers = {
        "h_init": randn(k["h_init"], (f,), dtype),
        "c_init": randn(k["c_init"], (f,), dtype),
    }
    return params, buffers


# Above this many elements in the hoisted (T, 4, F, N) pre-gate tensor,
# the scan switches to the rematerialized in-body path: the hoisted
# stack + its saved-for-backward copy + cotangent are ~4 buffers of
# T*4*F*N floats — at 500k nodes that is ~12 GB and the single-chip
# compile dies allocating them (results/recurrent_compile_boundary.md).
_PRE_BUDGET_ELEMS = 1 << 28


def _lstm_scan_remat(
    p: dict, h0: jax.Array, c0: jax.Array, Yt: jax.Array, unroll: int
) -> jax.Array:
    """Memory-lean LSTM scan: gates computed IN-BODY from (T, F, N).

    The body is ``jax.checkpoint``-ed, so the backward recomputes the
    per-step gate pre-activations instead of keeping the (T, 4, F, N)
    stack alive — peak memory drops from ~4x the stack to the (T, F, N)
    input + output + cotangents. Same per-gate dot lengths as
    ``_lstm_scan_pre`` (W^T y + b first, + U^T h second), so results
    match the hoisted path bit-for-bit in f64 and to fp rounding in f32.
    """
    F = p["Uf"].shape[0]
    W = jnp.concatenate(
        [p[f"W{g}"].astype(Yt.dtype) for g in "fjoc"], axis=1
    )  # (F, 4F)
    U = jnp.concatenate([p["Uf"], p["Uj"], p["Uo"], p["Uc"]], axis=1)
    b = jnp.concatenate([p[f"b{g}"] for g in "fjoc"])  # (4F,)

    def step(carry, y):
        h, c = carry  # (F, N)
        z = ((W.T @ y + b[:, None]) + U.T @ h).reshape(4, F, -1)
        f, j, o, ct = jax.nn.sigmoid(z)
        c = j * ct + f * c
        h = o * jnp.tanh(c)
        return (h, c), h

    n = Yt.shape[-1]
    carry0 = (jnp.tile(h0[:, None], (1, n)), jnp.tile(c0[:, None], (1, n)))
    _, Z = jax.lax.scan(jax.checkpoint(step), carry0, Yt, unroll=unroll)
    return Z  # (T, F, N)


def lstm_scan(
    params: dict, h0: jax.Array, c0: jax.Array, Y: jax.Array,
    unroll: int | None = None,
    remat: bool | None = None,
) -> jax.Array:
    """Scan the shared-weight LSTM over (T, N, F) -> (T, N, F).

    Two layout decisions for the TPU:

    * The input-side gate contributions ``Y @ W_g + b_g`` depend only on
      the (precomputed) embeddings, so they run as four batched matmuls
      over all T slices before the scan; the sequential body keeps only
      the recurrent ``h @ U_g`` half.
    * The scan state runs TRANSPOSED, (F, N): with F ~ 6 the (N, F)
      layout pads the 128-lane minor dimension ~21x, so every per-step
      gate op would move 16x more VREG tiles than needed (same trick as
      the adapters' (F0, E) edge-row cache). Transposes happen once at
      the scan boundary, not per step.
    """
    p = params
    if remat is None:
        remat = Y.size * 4 > _PRE_BUDGET_ELEMS
    if remat:
        Zt = _lstm_scan_remat(
            p, h0, c0, jnp.swapaxes(Y, 1, 2), unroll if unroll else 8
        )
        return jnp.swapaxes(Zt, 1, 2)
    # (T, 4, F, N) input-gate contributions, bias folded in, all four
    # gates stacked so the scan body issues ONE recurrent matmul.
    pre = jnp.stack(
        [
            jnp.einsum("fk,tnf->tkn", p[f"W{g}"].astype(Y.dtype), Y)
            + p[f"b{g}"][:, None]
            for g in "fjoc"  # order must match the U concat below
        ],
        axis=1,
    )
    return jnp.swapaxes(_lstm_scan_pre(p, h0, c0, pre, unroll), 1, 2)


def lstm_scan_t(
    params: dict, h0: jax.Array, c0: jax.Array, Yt: jax.Array,
    unroll: int | None = None,
    remat: bool | None = None,
) -> jax.Array:
    """lstm_scan on a TRANSPOSED (T, F, N) input -> (T, N, F) output.

    The lane-major fast path: with the embeddings already in (F, N)
    layout, the gate contributions are batched (F, F) @ (F, N) matmuls —
    no reads of an F-minor array (F ~ 6 pads the 128-lane dimension
    ~21x, so the (T, N, F) einsum in lstm_scan touches 21x more VREG
    tiles than its data needs). One transpose at the end returns the
    readout's (T, N, F) layout.

    remat=None auto-selects the in-body rematerialized scan when the
    hoisted pre-gate stack would exceed ``_PRE_BUDGET_ELEMS`` (large-N
    single-chip configs; results/recurrent_compile_boundary.md).
    """
    p = params
    if remat is None:
        remat = Yt.size * 4 > _PRE_BUDGET_ELEMS
    if remat:
        Zt = _lstm_scan_remat(p, h0, c0, Yt, unroll if unroll else 8)
        return jnp.swapaxes(Zt, 1, 2)
    pre = jnp.stack(
        [
            jnp.einsum("kg,tkn->tgn", p[f"W{g}"].astype(Yt.dtype), Yt)
            + p[f"b{g}"][:, None]
            for g in "fjoc"
        ],
        axis=1,
    )
    return jnp.swapaxes(_lstm_scan_pre(p, h0, c0, pre, unroll), 1, 2)


def _lstm_scan_pre(
    p: dict, h0: jax.Array, c0: jax.Array, pre: jax.Array,
    unroll: int | None,
) -> jax.Array:
    """Shared scan over precomputed (T, 4, F, N) gate contributions."""
    # (F, 4F): recurrent weights stacked on the output axis. Each output
    # element is the same length-F dot product as the unfused version,
    # so f64 parity is bit-compatible per gate.
    U = jnp.concatenate([p["Uf"], p["Uj"], p["Uo"], p["Uc"]], axis=1)
    F = p["Uf"].shape[0]

    def step(carry, xs):
        h, c = carry  # (F, N)
        z = xs + (U.T @ h).reshape(4, F, -1)  # one (4F, F)@(F, N) matmul
        f, j, o, ct = jax.nn.sigmoid(z)
        c = j * ct + f * c
        h = o * jnp.tanh(c)
        return (h, c), h

    n = pre.shape[-1]
    carry0 = (jnp.tile(h0[:, None], (1, n)), jnp.tile(c0[:, None], (1, n)))
    if unroll is None:
        # Full unroll for moderate T: XLA then fuses across steps and the
        # backward needs no scan-carry stacking — measured fwd+bwd on the
        # chess shape (T=80, N=7301): 2.06 ms at unroll=8 -> 1.31 ms
        # fully unrolled, while PARTIAL unrolls are non-monotonic and
        # worse (u16 3.2 ms, u40 4.0 ms; results/wdgcn_profile.json).
        # Guard compile time for long-T configs with the u8 fallback.
        unroll = pre.shape[0] if pre.shape[0] <= 128 else 8
    _, Z = jax.lax.scan(step, carry0, pre, unroll=unroll)
    return Z  # (T, F, N)


@dataclasses.dataclass(frozen=True)
class WDGCN:
    """WD-GCN with edge-readout head. hidden_feat = [F1, C]."""

    n_slices: int
    in_feat: int
    hidden_feat: tuple[int, int]
    dtype: jnp.dtype = jnp.float32
    spmm_impl: str = "jnp"
    # LSTM scan unroll override (None = the lstm_scan heuristic: full
    # unroll for T<=128). Large-N configs need a rolled scan — the full
    # unroll's program size is what breaks the 500k-node compile
    # (results/recurrent_compile_boundary.md).
    scan_unroll: int | None = None

    def init(self, key: jax.Array) -> dict:
        f0, (f1, c) = self.in_feat, self.hidden_feat
        k = split_dict(key, ["W", "lstm", "U"])
        lstm_params, lstm_buffers = _init_lstm(k["lstm"], f1, self.dtype)
        return {
            "params": {"W": randn(k["W"], (f0, f1), self.dtype), "lstm": lstm_params},
            # U frozen at init, never trained (wd_gcn_functions.py:55).
            "buffers": {"U": randn(k["U"], (2 * f1, c), self.dtype), **lstm_buffers},
        }

    def propagate(self, A: TemporalCOO, X: jax.Array) -> jax.Array:
        """AX — parameter-independent, cacheable (wd_gcn_functions.py:33)."""
        return spmm(A, X, impl=self.spmm_impl)

    def embed(
        self,
        variables: dict,
        A: TemporalCOO,
        X: jax.Array,
        AX: jax.Array | None = None,
        AXt: jax.Array | None = None,
    ) -> jax.Array:
        p, b = variables["params"], variables["buffers"]
        if AXt is not None:
            # Lane-major fast path: the adapter caches the transposed
            # (T, F0, N) propagation, so the GCN matmul, the gate
            # contributions and the scan all run with N on the 128-lane
            # axis (results/wdgcn_profile.json: the (T, N, F) layout is
            # the dominant epoch cost at F=6).
            AXt = AXt.astype(self.dtype)  # reference f32 buffer truncation
            Yt = jax.nn.relu(
                jnp.einsum("fk,tfn->tkn", p["W"].astype(self.dtype), AXt)
            )
            return lstm_scan_t(
                p["lstm"], b["h_init"], b["c_init"], Yt,
                unroll=self.scan_unroll,
            )
        if AX is None:
            AX = self.propagate(A, X)
        AX = AX.astype(self.dtype)  # reference f32 buffer truncation
        Y = jax.nn.relu(jnp.matmul(AX, p["W"].astype(AX.dtype)))
        return lstm_scan(
            p["lstm"], b["h_init"], b["c_init"], Y, unroll=self.scan_unroll
        )

    def apply(
        self,
        variables: dict,
        A: TemporalCOO,
        X: jax.Array,
        edges: jax.Array,
        AX: jax.Array | None = None,
        readout_op=None,
        AXt: jax.Array | None = None,
    ) -> jax.Array:
        Z = self.embed(variables, A, X, AX, AXt=AXt)
        U = variables["buffers"]["U"]
        if readout_op is not None:
            return readout_op(Z, U)
        return edge_readout(Z, edges, U)


@dataclasses.dataclass(frozen=True)
class WDGCNReg:
    """WD-GCN with per-node linear regression head -> (T, N).

    Divergence (deliberate fix): the reference's regression forward
    ignores its (A, X) arguments unless edges are also passed
    (wd_gcn_functions.py:138-142), so its SEIR val/test numbers re-score
    the training window. This implementation evaluates the data given.
    """

    n_slices: int
    in_feat: int
    hidden_feat: tuple[int, int]
    dtype: jnp.dtype = jnp.float32
    spmm_impl: str = "jnp"

    def init(self, key: jax.Array) -> dict:
        f0, (f1, _) = self.in_feat, self.hidden_feat
        k = split_dict(key, ["W", "lstm", "lin_w", "lin_b"])
        lstm_params, lstm_buffers = _init_lstm(k["lstm"], f1, self.dtype)
        bound = 1.0 / jnp.sqrt(jnp.asarray(f1, self.dtype))
        return {
            "params": {
                "W": randn(k["W"], (f0, f1), self.dtype),
                "lstm": lstm_params,
                "lin_w": jax.random.uniform(
                    k["lin_w"], (f1, 1), self.dtype, minval=-bound, maxval=bound
                ),
                "lin_b": jax.random.uniform(
                    k["lin_b"], (1,), self.dtype, minval=-bound, maxval=bound
                ),
            },
            "buffers": lstm_buffers,
        }

    def apply(
        self,
        variables: dict,
        A: TemporalCOO,
        X: jax.Array,
        AX: jax.Array | None = None,
    ) -> jax.Array:
        p, b = variables["params"], variables["buffers"]
        if AX is None:
            AX = spmm(A, X, impl=self.spmm_impl)
        AX = AX.astype(self.dtype)
        Y = jax.nn.relu(jnp.matmul(AX, p["W"].astype(AX.dtype)))
        Z = lstm_scan(p["lstm"], b["h_init"], b["c_init"], Y)
        out = jnp.matmul(Z, p["lin_w"].astype(Z.dtype)) + p["lin_b"].astype(Z.dtype)
        return out[..., 0]
