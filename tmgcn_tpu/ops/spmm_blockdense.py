"""Block-dense (BCSR-style) SpMM: dense MXU tiles instead of gathers.

The windowed Pallas kernel (kernels/spmm_pallas.py) is bound by the HBM
cost of its random-row gather: fetching one feature row by index costs a
whole (8, 128) tile regardless of F. But the operators this framework
actually runs are *block-local* — node ids are ordered by first
appearance and M is banded, so nonzeros cluster: on chess the
readout-restricted layer-2 operator packs its 330k nonzeros into 2.3k
nonempty 128x128 blocks (~1.6% of the block grid, ~2% in-block density).

This operator exploits that by materializing each nonempty B x B block
DENSELY (host-side, once) and running the SpMM as three matmuls — a TPU
runs dense tiles so much faster than scattered rows that a 98%-zeros
dense block beats an exact sparse gather:

    YbT = pad(Y).panels^T                  # input, (ncb, F, B) lane-dense
    G   = oh_cw @ YbT                      # block gather  (nb, F, B)
    P   = G @ AblkT                        # batched MXU   (nb, F, B)
    Z^T = oh_rw @ P.reshape(nb, F*B)       # block scatter (nrb, F, B)

where oh_cw (nb, ncb) / oh_rw (nrb, nb) are 0/1 block-incidence
matrices. Everything is a plain XLA dot: sequential DMA only (no random
access), autodiff transposes each matmul natively (no custom VJP), and
the same code runs unchanged on CPU for tests.

Measured (chess restricted operator, (20203 x 87089), 330k nnz, F=6,
TPU v5e): forward 0.67 ms exact / 0.41 ms fast vs 1.74 ms for the
Pallas windowed kernel; fwd+bwd 1.10 ms vs 3.3 ms.

Cost model: bytes = nb * B^2 * itemsize streamed per apply (the block
tensor dominates), flops = nb * B^2 * max(F, 128) * 2 MXU. Worth it
whenever  nb * B^2 * itemsize  <  nnz * 4096  (the tile-gather floor of
the sparse path). ``estimate`` reports both so callers can auto-select;
``make_flat_operator`` refuses pathological inputs via ``max_bytes``.

Capability reference: replaces the per-epoch A_t @ X_t loop of
IBM/TM-GCN (TensorGCN-master/embedding_help_functions.py:301-312) for
layer-2 training; the reference computes it as T serialized
torch.sparse.mm calls.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_BLOCK = 128

_MODES = ("exact", "fast", "bf16")


def _precision(mode: str):
    return (
        jax.lax.Precision.HIGHEST if mode == "exact" else jax.lax.Precision.DEFAULT
    )


def _apply_inc(inc, x2d: jax.Array, prec) -> jax.Array:
    """Apply a block incidence: a dense 0/1 matmul or a nested operator."""
    if isinstance(inc, BlockDenseOperator):
        return inc(x2d)
    return jnp.matmul(inc, x2d, precision=prec)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["AblkT", "oh_rw", "oh_cw"],
    meta_fields=["n_in", "n_out", "block", "mode", "nrb", "ncb"],
)
@dataclasses.dataclass(frozen=True)
class BlockDenseOperator:
    """A prepacked rectangular block-dense operator: (n_in, F) -> (n_out, F).

    AblkT: (nb, B, B) dense blocks, stored TRANSPOSED per block (f32, or
        bf16 in "bf16" mode): the whole pipeline runs in (F, B) block
        layout — panels transposed once at the operator boundary — so
        the 128-wide block dimension is the lane axis of every
        intermediate. With small F (the dominant case, F ~ 6) the naive
        (B, F) layout pads each intermediate 128/F-fold in HBM; the
        transposed layout's intermediates are lane-dense at identical
        MXU cycle counts.
    oh_rw: output block-row incidence — a dense (nrb, nb) 0/1 matrix, or
        (when that would be large) a nested BlockDenseOperator over the
        staircase-sparse incidence stream: block ids are row-sorted, so
        the incidence itself is block-local and one level of nesting
        always suffices.
    oh_cw: input incidence, (nb, ncb) likewise.
    mode: "exact" (f32, HIGHEST), "fast" (f32, DEFAULT MXU rounding),
        "bf16" (bf16 blocks + gather traffic, f32 accumulation).
    """

    AblkT: jax.Array
    oh_rw: object
    oh_cw: object
    n_in: int
    n_out: int
    block: int
    mode: str
    nrb: int
    ncb: int

    @property
    def n_blocks(self) -> int:
        return self.AblkT.shape[0]

    def __call__(self, flat: jax.Array) -> jax.Array:
        B = self.block
        F = flat.shape[-1]
        out_dtype = flat.dtype
        prec = _precision(self.mode)
        nb = self.AblkT.shape[0]
        nrb, ncb = self.nrb, self.ncb
        if nb == 0:
            return jnp.zeros((self.n_out, F), out_dtype)
        Yp = jnp.pad(flat, ((0, ncb * B - self.n_in), (0, 0)))
        # (ncb, F, B) panels: one boundary transpose into lane-dense form.
        YbT = Yp.reshape(ncb, B, F).transpose(0, 2, 1).reshape(ncb, F * B)
        G = _apply_inc(self.oh_cw, YbT, prec).reshape(nb, F, B)
        # P[b] = G[b] @ A[b]^T  <=>  (A[b] @ Y_panel[b])^T
        P = jnp.matmul(
            G.astype(self.AblkT.dtype),
            self.AblkT,
            precision=prec,
            preferred_element_type=jnp.float32,
        )
        Z = _apply_inc(self.oh_rw, P.reshape(nb, F * B), prec)
        Z = Z.reshape(nrb, F, B).transpose(0, 2, 1).reshape(nrb * B, F)
        return Z[: self.n_out].astype(out_dtype)


def estimate(
    rows: np.ndarray, cols: np.ndarray, block: int = DEFAULT_BLOCK,
    itemsize: int = 4,
) -> dict:
    """Host-side cost preview: block count, bytes/apply, vs gather floor.

    gather_floor_bytes is the HBM the sparse path cannot avoid (one
    (8,128) tile per nonzero row fetch); block_bytes is what this
    operator streams instead. ratio < 1 means block-dense moves less.
    ``itemsize`` is the element width of the precision class being
    compared (4 = f32 blocks vs f32 gathers, 2 = bf16 blocks vs bf16
    gathers); it scales both sides equally, so the RATIO is
    itemsize-invariant — it is threaded through so the absolute byte
    counts in the preview are honest for the selected mode.
    """
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    nnz = len(rows)
    if nnz == 0:
        return {"nnz": 0, "n_blocks": 0, "block_bytes": 0, "ratio": 0.0}
    keys = (rows // block) << 32 | (cols // block)
    nb = len(np.unique(keys))
    block_bytes = nb * block * block * itemsize
    gather_floor = nnz * 8 * 128 * itemsize  # one tile per row fetch
    return {
        "nnz": int(nnz),
        "n_blocks": int(nb),
        "block_bytes": int(block_bytes),
        "gather_floor_bytes": int(gather_floor),
        "ratio": block_bytes / gather_floor,
    }


def make_flat_operator(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    n_in: int,
    n_out: int,
    block: int = DEFAULT_BLOCK,
    mode: str = "exact",
    max_bytes: int | None = 2 << 30,
    dense_limit: int | None = 1 << 22,
) -> BlockDenseOperator:
    """Prepack a rectangular flat (row, col, val) stream (host-side, once).

    Raises ValueError when the dense block tensor would exceed
    ``max_bytes`` (pass None to disable) — callers fall back to the
    Pallas/rowsplit sparse operators for block-hostile patterns.

    Incidence matrices above ``dense_limit`` elements are built as
    nested block-dense operators over their (staircase-sparse) unit
    streams instead of dense 0/1 matrices (None = always dense; used
    internally to terminate the recursion).
    """
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    vals = np.asarray(vals)
    B = block
    nrb = max(1, -(-n_out // B))
    ncb = max(1, -(-n_in // B))
    dtype = jnp.bfloat16 if mode == "bf16" else jnp.float32
    if len(rows) == 0:
        return BlockDenseOperator(
            AblkT=jnp.zeros((0, B, B), dtype),
            oh_rw=jnp.zeros((nrb, 0), jnp.float32),
            oh_cw=jnp.zeros((0, ncb), jnp.float32),
            n_in=int(n_in),
            n_out=int(n_out),
            block=B,
            mode=mode,
            nrb=nrb,
            ncb=ncb,
        )

    bkey = (rows // B) * ncb + (cols // B)
    order = np.argsort(bkey, kind="stable")
    rs, cs, vs = rows[order], cols[order], vals[order]
    ub, inv = np.unique(bkey[order], return_inverse=True)
    nb = len(ub)
    itemsize = 2 if mode == "bf16" else 4
    need = nb * B * B * itemsize
    if max_bytes is not None and need > max_bytes:
        raise ValueError(
            f"block-dense tensor would be {need / 1e9:.2f} GB "
            f"({nb} blocks of {B}x{B}) > max_bytes; use a sparse operator"
        )
    # Transposed per-block storage (col-major within the block — see the
    # operator docstring). Duplicate (row, col) entries must ADD;
    # bincount over the flattened index is ~10x faster than np.add.at
    # but allocates float64 (2x the f32 tensor), so fall back to add.at
    # for very large block tensors.
    n_cells = nb * B * B
    if n_cells <= 1 << 28:  # 2 GB f64 transient cap
        flat_idx = (inv.astype(np.int64) * B + cs % B) * B + rs % B
        AblkT = np.bincount(
            flat_idx, weights=vs.astype(np.float64), minlength=n_cells
        ).astype(np.float32).reshape(nb, B, B)
    else:
        AblkT = np.zeros((nb, B, B), np.float32)
        np.add.at(AblkT, (inv, cs % B, rs % B), vs.astype(np.float64))
    rw = (ub // ncb).astype(np.int64)
    cw = (ub % ncb).astype(np.int64)

    def incidence(out_ids, in_ids, n_o, n_i):
        if dense_limit is None or n_o * n_i <= dense_limit:
            oh = np.zeros((n_o, n_i), np.float32)
            oh[out_ids, in_ids] = 1.0
            return jnp.asarray(oh)
        # Nested operator over the unit stream; its own incidences are
        # small (the stream is a sorted staircase), so force dense.
        return make_flat_operator(
            out_ids, in_ids, np.ones(len(out_ids), np.float32),
            n_in=n_i, n_out=n_o, block=B,
            mode="exact" if mode == "exact" else "fast",
            max_bytes=None, dense_limit=None,
        )

    ar = np.arange(nb)
    return BlockDenseOperator(
        AblkT=jnp.asarray(AblkT, dtype),
        oh_rw=incidence(rw, ar, nrb, nb),
        oh_cw=incidence(ar, cw, nb, ncb),
        n_in=int(n_in),
        n_out=int(n_out),
        block=B,
        mode=mode,
        nrb=nrb,
        ncb=ncb,
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["flat"],
    meta_fields=["T", "N"],
)
@dataclasses.dataclass(frozen=True)
class TemporalBlockDenseOperator:
    """Square per-slice SpMM as one flat block-dense operator.

    The temporal operator Y[t] = A[t] @ X[t] flattened to global ids
    (t*N + i) is slice-block-diagonal, which the flat packer exploits
    automatically (a slice's blocks only reference that slice's input
    panels). Drop-in for the other prepacked operators: models call it
    through ``ops.spmm.spmm`` (it dispatches on callables).
    """

    T: int
    N: int
    flat: BlockDenseOperator

    @property
    def n_slices(self) -> int:
        return self.T

    @property
    def n_nodes(self) -> int:
        return self.N

    @property
    def mode(self) -> str:
        return self.flat.mode

    def __call__(self, X: jax.Array) -> jax.Array:
        F = X.shape[-1]
        return self.flat(X.reshape(self.T * self.N, F)).reshape(self.T, self.N, F)


def make_operator(
    A,
    block: int = DEFAULT_BLOCK,
    mode: str = "exact",
    max_bytes: int | None = 8 << 30,
    dense_limit: int | None = 1 << 22,
) -> TemporalBlockDenseOperator:
    """Prepack a TemporalCOO tensor as a block-dense operator (host-side).

    Flattens slices to global (t*N + i) ids and packs the flat stream.
    max_bytes defaults higher than the flat builder's: full-graph
    operators are the large-but-profitable case this exists for.
    """
    from tmgcn_tpu.ops.spmm_rowsplit import flatten_stream

    g_rows, g_cols, g_vals = flatten_stream(A)
    T, N = A.n_slices, A.n_nodes
    return TemporalBlockDenseOperator(
        T=T,
        N=N,
        flat=make_flat_operator(
            g_rows, g_cols, g_vals, n_in=T * N, n_out=T * N,
            block=block, mode=mode, max_bytes=max_bytes,
            dense_limit=dense_limit,
        ),
    )
