"""The M-transform: temporal mixing via a T x T matrix.

``m_transform(M, X)`` computes the mode-1 tensor-matrix product
``Xt = M ×₁ X``, i.e. ``Xt[s] = Σ_t M[s, t] X[t]`` — mixing each time
slice with its band of predecessors (capability reference:
``t.matmul(self.M, X.reshape(T, -1)).reshape(...)`` in IBM/TM-GCN,
TensorGCN-master/embedding_help_functions.py:204).

On TPU this is a single (T, T) x (T, N*F) matmul — exactly the shape the
MXU wants — so the default implementation is one einsum that XLA maps
onto the systolic array and fuses with neighboring elementwise work. The
banded structure matters for *sharding*, not for single-chip compute:
when the time axis is sharded across a mesh, each shard only needs
``band_offsets(M)`` halo slices from its neighbors (see
``tmgcn_tpu.parallel``).

The sparse-input variant ``m_transform_coo`` applies M to a temporal
sparse tensor (used in preprocessing to build the transformed adjacency
Ct from C, reference func_MProduct read_data.py:204-223) — computed
host-side in scipy since it is an offline artifact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from tmgcn_tpu.core.sparse import TemporalCOO


def m_transform(M: jax.Array, X: jax.Array) -> jax.Array:
    """Dense M-transform: (T, T) x (T, ...) -> (T, ...) along axis 0."""
    T = X.shape[0]
    flat = X.reshape(T, -1)
    out = jnp.matmul(M.astype(X.dtype), flat, preferred_element_type=X.dtype)
    return out.reshape(X.shape)


def m_transform_inverse(
    M: jax.Array, X: jax.Array, assume_lower_triangular: bool | None = None
) -> jax.Array:
    """Apply M^{-1} along the time axis.

    Banded (lower-triangular) M uses a triangular solve; dense families
    (DCT) need a general solve. Auto-detects on concrete M; pass the
    flag explicitly when M is traced.
    """
    T = X.shape[0]
    flat = X.reshape(T, -1)
    lower = assume_lower_triangular
    if lower is None:
        try:
            lower = bool(np.allclose(np.triu(np.asarray(M), k=1), 0.0))
        except jax.errors.TracerArrayConversionError:
            lower = False  # general solve is always correct
    Mx = M.astype(X.dtype)
    if lower:
        out = jax.scipy.linalg.solve_triangular(Mx, flat, lower=True)
    else:
        out = jnp.linalg.solve(Mx, flat)
    return out.reshape(X.shape)


def m_transform_coo(
    C: TemporalCOO, M: np.ndarray, pad_multiple: int = 128
) -> TemporalCOO:
    """Sparse M-transform (host-side): Ct[s] = Σ_t M[s, t] C[t].

    Builds the transformed temporal adjacency used by TM-GCN models. Each
    output slice is a weighted union of the input slices in M's band;
    computed with scipy CSR accumulation, then repacked padded/sorted.
    """
    M = np.asarray(M)
    T = C.n_slices
    N = C.n_nodes
    rows = np.asarray(C.rows)
    cols = np.asarray(C.cols)
    vals = np.asarray(C.vals, dtype=np.float64)
    nnz = np.asarray(C.nnz)

    csr = []
    for k in range(T):
        n = int(nnz[k])
        csr.append(
            sp.coo_matrix((vals[k, :n], (rows[k, :n], cols[k, :n])), shape=(N, N)).tocsr()
        )

    out_slices = []
    for s in range(T):
        acc = sp.csr_matrix((N, N), dtype=np.float64)
        for t in np.nonzero(M[s])[0]:
            acc = acc + M[s, t] * csr[int(t)]
        acc = acc.tocoo()
        out_slices.append((acc.row, acc.col, acc.data))

    return TemporalCOO.from_slices(
        out_slices, N, dtype=C.vals.dtype, pad_multiple=pad_multiple
    )
