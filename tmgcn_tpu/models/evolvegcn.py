"""EvolveGCN-H: a GRU evolves the GCN weights across time.

The one genuinely sequential model family: at each time step a GRU cell
updates the layer weight matrix from a top-k summary of the current node
embeddings, then the slice is propagated with the evolved weights. The
time recurrence maps onto ``lax.scan`` (weights are the carry; the padded
per-slice COO arrays and features are the scanned inputs), so the whole
model is one compiled loop rather than a Python loop over slices.

Capability reference: IBM/TM-GCN TensorGCN-master/evolvegcn_functions.py —
EvolveGCN_1_layer :22-101, EvolveGCN_2_layer :104-213, EvolveGCN_reg
:310-381; summarize (top-k scored by learned vector p) :80-84, GRU cell g
:86-91, GCONV :97-101. The initial weights W_init are deliberately
non-learned random buffers threaded from training into val/test forward
passes (experiment_bitcoin_evolvegcn.py:132-148); ``apply`` therefore
takes optional explicit initial weights and always returns the evolved
finals.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tmgcn_tpu.core.sparse import TemporalCOO
from tmgcn_tpu.models.common import randn, split_dict
from tmgcn_tpu.ops.edge_readout import edge_readout
from tmgcn_tpu.ops.spmm import spmm, spmm_slice


def summarize(X: jax.Array, p: jax.Array, k: int) -> jax.Array:
    """Top-k node summary: rows of X scored/scaled by X @ p / ||p||."""
    y = jnp.matmul(X, p) / jnp.linalg.norm(p)
    top_y, idx = jax.lax.top_k(y, k)
    return X[idx] * top_y[:, None]


def gru_cell(cell: dict, Xs: jax.Array, H: jax.Array) -> jax.Array:
    """The weight-evolution GRU: inputs (F, k) summary, carry (F, k) W."""
    Z = jax.nn.sigmoid(cell["W_Z"] @ Xs + cell["U_Z"] @ H + cell["B_Z"])
    R = jax.nn.sigmoid(cell["W_R"] @ Xs + cell["U_R"] @ H + cell["B_R"])
    Ht = jnp.tanh(cell["W_H"] @ Xs + cell["U_H"] @ (R * H) + cell["B_H"])
    return (1.0 - Z) * H + Z * Ht


def _init_cell(key: jax.Array, f_in: int, f_out: int, dtype) -> dict:
    names = ["p", "W_Z", "U_Z", "B_Z", "W_R", "U_R", "B_R", "W_H", "U_H", "B_H"]
    k = split_dict(key, names)
    cell = {"p": randn(k["p"], (f_in,), dtype)}
    for gate in ["Z", "R", "H"]:
        cell[f"W_{gate}"] = randn(k[f"W_{gate}"], (f_in, f_in), dtype)
        cell[f"U_{gate}"] = randn(k[f"U_{gate}"], (f_in, f_in), dtype)
        cell[f"B_{gate}"] = randn(k[f"B_{gate}"], (f_in, f_out), dtype)
    return cell


def _evolve_step(cell: dict, W: jax.Array, x: jax.Array) -> jax.Array:
    """W_t = GRU(summarize(X_t, k)^T, W_{t-1})."""
    k = W.shape[1]
    return gru_cell(cell, summarize(x, cell["p"], k).T, W)


def batched_summaries(cell: dict, X: jax.Array, k: int) -> jax.Array:
    """All slices' GRU inputs summarize(X_t, p, k)^T at once: (T, F, k).

    The top-k summary depends only on the features and the fixed scoring
    vector p — not on the evolving weights — so the per-step top_k and
    gather hoist out of the sequential scan as ONE batched call (the
    scan then carries nothing but the tiny GRU; measured 6.96 -> ~2 ms
    per chess training epoch). Identical math to summarize() per slice.
    """
    p = cell["p"]
    y = jnp.matmul(X, p) / jnp.linalg.norm(p)  # (T, N)
    top_y, idx = jax.lax.top_k(y, k)  # (T, k)
    S = jnp.take_along_axis(X, idx[..., None], axis=1) * top_y[..., None]
    return jnp.swapaxes(S, 1, 2)


def evolve_weight_stack(
    cell: dict, X: jax.Array, W0: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Batched-summaries + GRU-only scan: (final W, (T, *W.shape) stack).

    The staging shared by every EvolveGCN fast path (single-device,
    sharded, classification and regression).

    The input-side gate contributions ``W_g @ S_t + B_g`` depend only on
    the (batched) summaries, so they hoist out of the scan as three
    batched einsums; the sequential body keeps only the recurrent
    ``U_g @ W`` halves, with U_Z/U_R stacked into one matmul (each
    output element is the same length-F dot product, so f64 parity is
    preserved per gate).
    """
    S = batched_summaries(cell, X, W0.shape[1])
    # Bias added AFTER the recurrent term in the step — bit-identical
    # summation order to gru_cell's (W@Xs + U@H) + B.
    pre = {g: jnp.einsum("ij,tjk->tik", cell[f"W_{g}"], S) for g in "ZRH"}
    UZR = jnp.concatenate([cell["U_Z"], cell["U_R"]], axis=0)  # (2F, F)
    BZR = jnp.stack([cell["B_Z"], cell["B_R"]])
    U_H, B_H = cell["U_H"], cell["B_H"]
    f = U_H.shape[0]

    def step(W, xs):
        zr = jax.nn.sigmoid(
            (jnp.stack([xs["Z"], xs["R"]]) + (UZR @ W).reshape(2, f, -1))
            + BZR
        )
        Z, R = zr
        Ht = jnp.tanh((xs["H"] + U_H @ (R * W)) + B_H)
        W = (1.0 - Z) * W + Z * Ht
        return W, W

    return jax.lax.scan(step, W0, pre, unroll=8)


@dataclasses.dataclass(frozen=True)
class EvolveGCN:
    """EvolveGCN-H with 1 or 2 layers and edge-readout head.

    hidden_feat = [F1, C] or [F1, F2, C].
    """

    n_slices: int
    in_feat: int
    hidden_feat: tuple[int, ...]
    dtype: jnp.dtype = jnp.float32
    # Stored embeddings dtype: the reference keeps GRU/GCONV math in
    # float64 but writes per-slice outputs into a float32 buffer
    # (evolvegcn_functions.py:66,164); None means same as dtype.
    embed_dtype: jnp.dtype | None = None

    @property
    def store_dtype(self):
        return self.embed_dtype if self.embed_dtype is not None else self.dtype

    @property
    def n_layers(self) -> int:
        return len(self.hidden_feat) - 1

    def init(self, key: jax.Array) -> dict:
        f = (self.in_feat,) + tuple(self.hidden_feat)
        if self.n_layers not in (1, 2):
            raise ValueError("EvolveGCN supports 1 or 2 layers")
        names = ["cell1", "W_init1", "U"] + (
            ["cell2", "W_init2"] if self.n_layers == 2 else []
        )
        k = split_dict(key, names)
        params = {
            "cell1": _init_cell(k["cell1"], f[0], f[1], self.dtype),
            "U": randn(k["U"], (2 * f[-2], f[-1]), self.dtype),
        }
        buffers = {"W_init1": randn(k["W_init1"], (f[0], f[1]), self.dtype)}
        if self.n_layers == 2:
            params["cell2"] = _init_cell(k["cell2"], f[1], f[2], self.dtype)
            buffers["W_init2"] = randn(k["W_init2"], (f[1], f[2]), self.dtype)
        return {"params": params, "buffers": buffers}

    def propagate(self, A: TemporalCOO, X: jax.Array) -> jax.Array:
        """AX per slice — constant across training epochs, cacheable.

        GCONV computes (A @ X) @ W_t (evolvegcn_functions.py:97-101);
        with AX cached the 1-layer scan contains no SpMM at all, and the
        2-layer scan keeps only its layer-2 (parameter-dependent) SpMM.
        """
        return spmm(A, X)

    def evolved_weights(
        self,
        variables: dict,
        X: jax.Array,
        W_init: jax.Array | None = None,
    ) -> tuple[jax.Array, jax.Array]:
        """1-layer weight evolution alone: (final W, (T, F0, F1) stack).

        The weight trajectory depends only on X (through the batched
        summaries) — adapters use this to build logits without ever
        materializing the (T, N, F1) embedding tensor.
        """
        if self.n_layers != 1:
            raise ValueError("evolved_weights is the 1-layer trajectory")
        p, b = variables["params"], variables["buffers"]
        W0 = b["W_init1"] if W_init is None else W_init
        return evolve_weight_stack(p["cell1"], X, W0)

    def embed_and_weights(
        self,
        variables: dict,
        A: TemporalCOO,
        X: jax.Array,
        W_init: jax.Array | None = None,
        W_init2: jax.Array | None = None,
        AX: jax.Array | None = None,
    ) -> tuple[jax.Array, tuple[jax.Array, ...]]:
        """Scan over time; return (T, N, F_last) embeddings + final weights."""
        p = variables["params"]
        b = variables["buffers"]
        W0 = b["W_init1"] if W_init is None else W_init
        n = A.n_nodes

        if self.n_layers == 1:
            if AX is not None:
                # Batched summaries + batched propagation: the scan body
                # is ONLY the (F0, F1)-sized GRU; the (T, N, F) work runs
                # as single large ops outside the sequential loop.
                W_fin, Ws = evolve_weight_stack(p["cell1"], X, W0)
                # einsum promotes like the per-step matmul did (AX f32 x
                # W f64 -> f64 in the strict-parity configuration).
                Y = jnp.einsum("tnf,tfk->tnk", AX, Ws)
                return Y.astype(self.store_dtype), (W_fin,)

            def step(W, xs):
                rows, cols, vals, x = xs
                W = _evolve_step(p["cell1"], W, x)
                h = jnp.matmul(spmm_slice(rows, cols, vals, x, n), W)
                return W, h.astype(self.store_dtype)

            W_fin, Y = jax.lax.scan(step, W0, (A.rows, A.cols, A.vals, X))
            return Y, (W_fin,)

        W20 = b["W_init2"] if W_init2 is None else W_init2

        if AX is not None:
            # Stage the whole 2-layer model as batched ops around two
            # GRU-only scans: layer-1 summaries depend only on X, so W1
            # evolves first; H1 then materializes in one einsum, which
            # makes the layer-2 summaries batchable too, and the layer-2
            # propagation runs as ONE batched SpMM instead of T
            # sequential per-slice ones.
            W_fin, W1s = evolve_weight_stack(p["cell1"], X, W0)
            H1 = jax.nn.relu(jnp.einsum("tnf,tfk->tnk", AX, W1s))
            W2_fin, W2s = evolve_weight_stack(p["cell2"], H1, W20)
            Y = jnp.einsum("tnf,tfk->tnk", spmm(A, H1), W2s)
            return Y.astype(self.store_dtype), (W_fin, W2_fin)

        def step2(carry, xs):
            W, W2 = carry
            rows, cols, vals, x = xs
            W = _evolve_step(p["cell1"], W, x)
            h = jax.nn.relu(jnp.matmul(spmm_slice(rows, cols, vals, x, n), W))
            W2 = _evolve_step(p["cell2"], W2, h)
            h = jnp.matmul(spmm_slice(rows, cols, vals, h, n), W2)
            return (W, W2), h.astype(self.store_dtype)

        (W_fin, W2_fin), Y = jax.lax.scan(step2, (W0, W20), (A.rows, A.cols, A.vals, X))
        return Y, (W_fin, W2_fin)

    def apply(
        self,
        variables: dict,
        A: TemporalCOO,
        X: jax.Array,
        edges: jax.Array,
        W_init: jax.Array | None = None,
        W_init2: jax.Array | None = None,
        AX: jax.Array | None = None,
        readout_op=None,
    ) -> tuple[jax.Array, tuple[jax.Array, ...]]:
        """Returns ((E, C) logits, evolved final weights)."""
        Y, finals = self.embed_and_weights(variables, A, X, W_init, W_init2, AX)
        U = variables["params"]["U"]
        if readout_op is not None:
            return readout_op(Y, U), finals
        return edge_readout(Y, edges, U), finals


@dataclasses.dataclass(frozen=True)
class EvolveGCNReg:
    """1-layer EvolveGCN-H with per-node linear regression head -> (T, N).

    Divergence (deliberate fix): the reference's SEIR driver passes
    val/test data to a forward that ignores it without an explicit
    W_init (evolvegcn_functions.py:341-347 falls back to the cached
    training tensors), so its reported val/test numbers re-score the
    training window. This implementation always evaluates the data it
    is given.
    """

    n_slices: int
    in_feat: int
    hidden_feat: tuple[int, int]
    dtype: jnp.dtype = jnp.float32
    embed_dtype: jnp.dtype | None = None

    @property
    def store_dtype(self):
        return self.embed_dtype if self.embed_dtype is not None else self.dtype

    def init(self, key: jax.Array) -> dict:
        f0, (f1, _) = self.in_feat, self.hidden_feat
        k = split_dict(key, ["cell1", "W_init1", "lin_w", "lin_b"])
        bound = 1.0 / jnp.sqrt(jnp.asarray(f1, self.dtype))
        return {
            "params": {
                "cell1": _init_cell(k["cell1"], f0, f1, self.dtype),
                "lin_w": jax.random.uniform(
                    k["lin_w"], (f1, 1), self.dtype, minval=-bound, maxval=bound
                ),
                "lin_b": jax.random.uniform(
                    k["lin_b"], (1,), self.dtype, minval=-bound, maxval=bound
                ),
            },
            "buffers": {"W_init1": randn(k["W_init1"], (f0, f1), self.dtype)},
        }

    def propagate(self, A: TemporalCOO, X: jax.Array) -> jax.Array:
        """AX per slice — constant across training epochs, cacheable."""
        return spmm(A, X)

    def apply(
        self,
        variables: dict,
        A: TemporalCOO,
        X: jax.Array,
        W_init: jax.Array | None = None,
        AX: jax.Array | None = None,
    ) -> jax.Array:
        p = variables["params"]
        W0 = variables["buffers"]["W_init1"] if W_init is None else W_init
        n = A.n_nodes

        if AX is not None:
            # Same hoist as the classifier: batched summaries feed a
            # GRU-only scan, then one batched propagation einsum.
            _, Ws = evolve_weight_stack(p["cell1"], X, W0)
            Y = jnp.einsum("tnf,tfk->tnk", AX, Ws).astype(self.store_dtype)
        else:

            def step(W, xs):
                rows, cols, vals, x = xs
                W = _evolve_step(p["cell1"], W, x)
                h = jnp.matmul(spmm_slice(rows, cols, vals, x, n), W)
                return W, h.astype(self.store_dtype)

            _, Y = jax.lax.scan(step, W0, (A.rows, A.cols, A.vals, X))
        out = jnp.matmul(Y, p["lin_w"].astype(Y.dtype)) + p["lin_b"].astype(Y.dtype)
        return out[..., 0]
