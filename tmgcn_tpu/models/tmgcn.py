"""TM-GCN: tensor M-product graph convolution models.

The flagship model family. A TM-GCN layer propagates node features
through the *M-transformed* normalized adjacency tensor Ct:

    layer(X) = Ct ⊛ (M ×₁ X) · W        (⊛ = per-slice SpMM)

optionally followed by the inverse transform M⁻¹ ×₁. Because the
temporal axis carries no recurrence (unlike EvolveGCN/WD-GCN), all T
slices execute as one batched SpMM + one MXU matmul — the property that
makes TM-GCN map so well onto TPUs.

Capability reference (IBM/TM-GCN, TensorGCN-master/
embedding_help_functions.py): EmbeddingGCN :156-234 (1 layer),
EmbeddingGCN2 :236-357 (2 layers, nonlin2/apply_M_twice/
apply_M_three_times options, float64 interlayer cast :335 and float32
head cast :355), EmbeddingGCN_reg :359-423 (regression head). All
experiments use condensed_W=True (one weight shared across slices) and
use_Minv=False; both options are still supported here for full parity.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tmgcn_tpu.core.sparse import TemporalCOO
from tmgcn_tpu.models.common import nonlinearity, randn, split_dict
from tmgcn_tpu.ops.edge_readout import edge_readout, edge_readout_bilinear
from tmgcn_tpu.ops.mtransform import m_transform, m_transform_inverse
from tmgcn_tpu.ops.spmm import spmm


@dataclasses.dataclass(frozen=True)
class TMGCN:
    """1-layer TM-GCN with edge-readout head.

    hidden_feat = [F1, C]: F1 embedding features, C output classes.
    """

    n_slices: int
    in_feat: int
    hidden_feat: tuple[int, int]
    condensed_W: bool = True
    use_Minv: bool = False
    dtype: jnp.dtype = jnp.float32
    spmm_impl: str = "jnp"
    # "concat" = the reference's additive head [Y_src, Y_trg] @ U
    # (U in R^{2F x C}); "bilinear" = (Y_src ⊙ Y_trg) @ U (U in R^{F x C}),
    # a framework extension that can express endpoint AFFINITY — required
    # for community-structured link prediction (see edge_readout_bilinear).
    readout: str = "concat"

    def init(self, key: jax.Array) -> dict:
        f0, (f1, c) = self.in_feat, self.hidden_feat
        k = split_dict(key, ["W", "U"])
        w_shape = (f0, f1) if self.condensed_W else (self.n_slices, f0, f1)
        u_rows = f1 if self.readout == "bilinear" else 2 * f1
        return {
            "params": {
                "W": randn(k["W"], w_shape, self.dtype),
                "U": randn(k["U"], (u_rows, c), self.dtype),
            },
            "buffers": {},
        }

    def propagate(self, Ct: TemporalCOO, X: jax.Array, M: jax.Array) -> jax.Array:
        """AtXt = Ct ⊛ (M ×₁ X) — parameter-independent, cacheable.

        The reference computes this once at model construction and trains
        on the cached tensor (embedding_help_functions.py:195); adapters
        do the same via the ``AtXt`` argument below.
        """
        return spmm(Ct, m_transform(M, X), impl=self.spmm_impl)

    def embed(
        self,
        variables: dict,
        Ct: TemporalCOO,
        X: jax.Array,
        M: jax.Array,
        AtXt: jax.Array | None = None,
    ) -> jax.Array:
        """(T, N, F1) node embeddings (the pre-readout tensor Y)."""
        if AtXt is None:
            AtXt = self.propagate(Ct, X, M)
        # The reference stores the cached propagation in a float32 buffer
        # regardless of input precision (t.zeros default dtype,
        # embedding_help_functions.py:205); casting to the model dtype
        # reproduces that truncation point exactly.
        AtXt = AtXt.astype(self.dtype)
        Y = jnp.matmul(AtXt, variables["params"]["W"].astype(AtXt.dtype))
        if self.use_Minv:
            Y = m_transform_inverse(M, Y)
        return Y

    def apply(
        self,
        variables: dict,
        Ct: TemporalCOO,
        X: jax.Array,
        edges: jax.Array,
        M: jax.Array,
        AtXt: jax.Array | None = None,
        readout_op=None,
    ) -> jax.Array:
        """(E, C) edge logits."""
        Y = self.embed(variables, Ct, X, M, AtXt)
        U = variables["params"]["U"]
        if self.readout == "bilinear":
            return edge_readout_bilinear(Y, edges, U)
        if readout_op is not None:
            return readout_op(Y, U)
        return edge_readout(Y, edges, U)


@dataclasses.dataclass(frozen=True)
class TMGCN2:
    """2-layer TM-GCN with edge-readout head.

    hidden_feat = [F1, F2, C]. The second layer reuses the same Ct; with
    use_Minv=False the default is a plain propagation of the layer-1
    output, apply_M_twice re-mixes it through M first, and
    apply_M_three_times applies M once more after layer 2 (the UCI
    link-prediction configuration).

    interlayer_dtype mirrors the reference's ``Y = Y.double()`` between
    layers (f64 for bit parity on CPU; keep None on TPU).
    """

    n_slices: int
    in_feat: int
    hidden_feat: tuple[int, int, int]
    condensed_W: bool = True
    use_Minv: bool = False
    apply_M_twice: bool = False
    apply_M_three_times: bool = False
    nonlin2: str = "relu"
    dtype: jnp.dtype = jnp.float32
    interlayer_dtype: jnp.dtype | None = None
    spmm_impl: str = "jnp"

    def __post_init__(self):
        if self.apply_M_three_times and not self.apply_M_twice:
            raise ValueError(
                "apply_M_three_times requires apply_M_twice (the third "
                "mixing happens inside the M-twice branch, "
                "embedding_help_functions.py:342-346)"
            )

    def init(self, key: jax.Array) -> dict:
        f0, (f1, f2, c) = self.in_feat, self.hidden_feat
        k = split_dict(key, ["W1", "W2", "U"])
        if self.condensed_W:
            w1_shape, w2_shape = (f0, f1), (f1, f2)
        else:
            w1_shape = (self.n_slices, f0, f1)
            w2_shape = (self.n_slices, f1, f2)
        return {
            "params": {
                "W1": randn(k["W1"], w1_shape, self.dtype),
                "W2": randn(k["W2"], w2_shape, self.dtype),
                "U": randn(k["U"], (2 * f2, c), self.dtype),
            },
            "buffers": {},
        }

    def propagate(self, Ct: TemporalCOO, X: jax.Array, M: jax.Array) -> jax.Array:
        """First-layer AtXt — parameter-independent, cacheable."""
        return spmm(Ct, m_transform(M, X), impl=self.spmm_impl)

    def embed(
        self,
        variables: dict,
        Ct: TemporalCOO,
        X: jax.Array,
        M: jax.Array,
        AtXt: jax.Array | None = None,
    ) -> jax.Array:
        p = variables["params"]
        nonlin = nonlinearity(self.nonlin2)

        if AtXt is None:
            AtXt = self.propagate(Ct, X, M)
        AtXt = AtXt.astype(self.dtype)  # reference f32 buffer truncation
        Y = jnp.matmul(AtXt, p["W1"].astype(AtXt.dtype))
        if self.use_Minv:
            Y = m_transform_inverse(M, Y)
        Y = nonlin(Y)
        if self.interlayer_dtype is not None:
            Y = Y.astype(self.interlayer_dtype)

        # Second-layer propagations run at Y's precision but land in the
        # reference's float32 buffers (compute_AX/compute_AtXt use t.zeros,
        # embedding_help_functions.py:302,309) — hence the dtype casts.
        W2 = p["W2"].astype(self.dtype)
        if self.use_Minv:
            AtYt = spmm(Ct, m_transform(M, Y), impl=self.spmm_impl).astype(self.dtype)
            Z = m_transform_inverse(M, jnp.matmul(AtYt, W2))
        elif self.apply_M_twice:
            AtYt = spmm(Ct, m_transform(M, Y), impl=self.spmm_impl).astype(self.dtype)
            Z = jnp.matmul(AtYt, W2)
            if self.apply_M_three_times:
                # Reference upcasts to float64 for the final mixing
                # (embedding_help_functions.py:346).
                up = self.interlayer_dtype if self.interlayer_dtype is not None else Z.dtype
                Z = m_transform(M.astype(up), Z.astype(up))
        else:
            AY = spmm(Ct, Y, impl=self.spmm_impl).astype(self.dtype)
            Z = jnp.matmul(AY, W2)
        return Z

    def apply(
        self,
        variables: dict,
        Ct: TemporalCOO,
        X: jax.Array,
        edges: jax.Array,
        M: jax.Array,
        AtXt: jax.Array | None = None,
        readout_op=None,
    ) -> jax.Array:
        Z = self.embed(variables, Ct, X, M, AtXt)
        # Reference casts edge embeddings back to float32 at the head
        # (embedding_help_functions.py:355).
        Z = Z.astype(self.dtype)
        U = variables["params"]["U"]
        if readout_op is not None:
            return readout_op(Z, U)
        return edge_readout(Z, edges, U)


@dataclasses.dataclass(frozen=True)
class TMGCNReg:
    """1-layer TM-GCN with a per-node linear regression head -> (T, N).

    Divergence (deliberate fix): the reference's regression forward
    always uses the cached training propagation
    (embedding_help_functions.py:410-412), so its SEIR val/test numbers
    re-score the training window. This implementation evaluates the
    data given.
    """

    n_slices: int
    in_feat: int
    hidden_feat: tuple[int, int]
    condensed_W: bool = True
    use_Minv: bool = False
    dtype: jnp.dtype = jnp.float32
    spmm_impl: str = "jnp"

    def init(self, key: jax.Array) -> dict:
        f0, (f1, _) = self.in_feat, self.hidden_feat
        k = split_dict(key, ["W", "lin_w", "lin_b"])
        w_shape = (f0, f1) if self.condensed_W else (self.n_slices, f0, f1)
        # Head mirrors nn.Linear(F1, 1): U(-1/sqrt(F1), 1/sqrt(F1)) init.
        bound = 1.0 / jnp.sqrt(jnp.asarray(f1, self.dtype))
        return {
            "params": {
                "W": randn(k["W"], w_shape, self.dtype),
                "lin_w": jax.random.uniform(
                    k["lin_w"], (f1, 1), self.dtype, minval=-bound, maxval=bound
                ),
                "lin_b": jax.random.uniform(
                    k["lin_b"], (1,), self.dtype, minval=-bound, maxval=bound
                ),
            },
            "buffers": {},
        }

    def propagate(self, Ct: TemporalCOO, X: jax.Array, M: jax.Array) -> jax.Array:
        return spmm(Ct, m_transform(M, X), impl=self.spmm_impl)

    def apply(
        self,
        variables: dict,
        Ct: TemporalCOO,
        X: jax.Array,
        M: jax.Array,
        AtXt: jax.Array | None = None,
    ) -> jax.Array:
        p = variables["params"]
        if AtXt is None:
            AtXt = self.propagate(Ct, X, M)
        AtXt = AtXt.astype(self.dtype)
        Y = jnp.matmul(AtXt, p["W"].astype(AtXt.dtype))
        if self.use_Minv:
            Y = m_transform_inverse(M, Y)
        out = jnp.matmul(Y, p["lin_w"].astype(Y.dtype)) + p["lin_b"].astype(Y.dtype)
        return out[..., 0]
