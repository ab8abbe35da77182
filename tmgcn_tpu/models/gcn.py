"""Static (Kipf–Welling-style) GCN baseline on temporal slices.

Per-slice graph convolution on the *untransformed* normalized adjacency —
no temporal mixing anywhere. Capability reference: EmbeddingKWGCN in
IBM/TM-GCN (TensorGCN-master/embedding_help_functions.py:425-497),
including its float64 interlayer cast in the 2-layer path (:486).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tmgcn_tpu.core.sparse import TemporalCOO
from tmgcn_tpu.models.common import nonlinearity, randn, split_dict
from tmgcn_tpu.ops.edge_readout import edge_readout
from tmgcn_tpu.ops.spmm import spmm


@dataclasses.dataclass(frozen=True)
class KWGCN:
    """1- or 2-layer per-slice GCN with edge-readout head.

    hidden_feat = [F1, C] (1 layer) or [F1, F2, C] (2 layers).
    """

    n_slices: int
    in_feat: int
    hidden_feat: tuple[int, ...]
    nonlin2: str = "relu"
    dtype: jnp.dtype = jnp.float32
    interlayer_dtype: jnp.dtype | None = None
    spmm_impl: str = "jnp"

    @property
    def n_layers(self) -> int:
        return len(self.hidden_feat) - 1

    def init(self, key: jax.Array) -> dict:
        f = (self.in_feat,) + tuple(self.hidden_feat)
        if self.n_layers == 2:
            k = split_dict(key, ["W1", "W2", "U"])
            params = {
                "W1": randn(k["W1"], (f[0], f[1]), self.dtype),
                "W2": randn(k["W2"], (f[1], f[2]), self.dtype),
                "U": randn(k["U"], (2 * f[-2], f[-1]), self.dtype),
            }
        elif self.n_layers == 1:
            k = split_dict(key, ["W1", "U"])
            params = {
                "W1": randn(k["W1"], (f[0], f[1]), self.dtype),
                "U": randn(k["U"], (2 * f[-2], f[-1]), self.dtype),
            }
        else:
            raise ValueError("KWGCN supports 1 or 2 layers")
        return {"params": params, "buffers": {}}

    def propagate(self, C: TemporalCOO, X: jax.Array) -> jax.Array:
        """First-layer AX — parameter-independent, cacheable (the
        reference caches it at init, embedding_help_functions.py:464)."""
        return spmm(C, X, impl=self.spmm_impl)

    def embed(
        self,
        variables: dict,
        C: TemporalCOO,
        X: jax.Array,
        AX: jax.Array | None = None,
    ) -> jax.Array:
        p = variables["params"]
        if AX is None:
            AX = self.propagate(C, X)
        # Reference stores propagations in float32 buffers (t.zeros,
        # embedding_help_functions.py:470); cast reproduces the truncation.
        AX = AX.astype(self.dtype)
        if self.n_layers == 2:
            Y = nonlinearity(self.nonlin2)(jnp.matmul(AX, p["W1"].astype(AX.dtype)))
            if self.interlayer_dtype is not None:
                Y = Y.astype(self.interlayer_dtype)
            AY = spmm(C, Y, impl=self.spmm_impl).astype(self.dtype)
            Z = jnp.matmul(AY, p["W2"].astype(AY.dtype))
        else:
            Z = jnp.matmul(AX, p["W1"].astype(AX.dtype))
        return Z

    def apply(
        self,
        variables: dict,
        C: TemporalCOO,
        X: jax.Array,
        edges: jax.Array,
        AX: jax.Array | None = None,
        readout_op=None,
    ) -> jax.Array:
        Z = self.embed(variables, C, X, AX).astype(self.dtype)
        U = variables["params"]["U"]
        if readout_op is not None:
            return readout_op(Z, U)
        return edge_readout(Z, edges, U)
