"""Pallas TPU kernel: fused scale + windowed segment reduction for SpMM.

Motivation (measured on TPU v5e): XLA lowers ``segment_sum`` to a
serialized scatter (~100 Mrows/s — the dominant cost of the SpMM path),
while its flat gather is ~Gbytes-fast. This kernel replaces the
scale+reduce half with MXU work:

  * Nonzeros are packed host-side into chunks of C entries whose sorted
    (global) row ids all fall in one W-aligned output window
    (``pack_windowed``). Chunks stream through VMEM; the (W, F) output
    window block accumulates across the chunks that touch it.
  * Per chunk, the segment reduction is computed as a one-hot matmul on
    the MXU: ``acc = onehot(rel_rows) @ (vals * gathered)`` where
    ``onehot`` is (W, C) built with a broadcasted-iota compare — turning
    a serialized scatter into ~W*F/(128*128) cycles per nonzero.
  * The gather (X rows by column id) stays in XLA, which already emits a
    fast vector gather; the kernel fuses the value scaling so the
    gathered array is read exactly once.

The forward is wrapped in a ``custom_vjp``: the backward pass is the
same kernel run with the transposed operator's packing (dX = Aᵀ dY),
prepared once alongside the forward packing.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tmgcn_tpu.core.sparse import TemporalCOO

DEFAULT_CHUNK = 256
DEFAULT_WINDOW = 256


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["rows", "cols", "vals", "window_id", "is_first"],
    meta_fields=["n_rows_out", "chunk", "window"],
)
@dataclasses.dataclass(frozen=True)
class PackedSpmm:
    """Host-packed chunk stream for the windowed scatter kernel.

    rows: (J, C) int32 — global output row per entry (padding repeats the
        window base with val 0).
    cols: (J, C) int32 — global gather row (flattened t*N + col).
    vals: (J, C) float — nonzero values; 0 on padding.
    window_id: (J,) int32 — output window index (rows // window).
    is_first: (J,) int32 — 1 iff this chunk is the first touching its
        window (the kernel initializes the block then).
    n_rows_out: padded output rows (multiple of window).
    """

    rows: jax.Array
    cols: jax.Array
    vals: jax.Array
    window_id: jax.Array
    is_first: jax.Array
    n_rows_out: int
    chunk: int
    window: int

    @property
    def n_chunks(self) -> int:
        return self.rows.shape[0]


def pack_windowed(
    A: TemporalCOO,
    chunk: int = DEFAULT_CHUNK,
    window: int = DEFAULT_WINDOW,
    sort_cols: bool = False,
) -> PackedSpmm:
    """Pack a temporal COO tensor for the kernel (host-side, once).

    Flattens slices (global rows t*N + r, global cols t*N + c), then
    packs the flat stream (see pack_windowed_flat).
    """
    rows_np = np.asarray(A.rows)
    cols_np = np.asarray(A.cols)
    vals_np = np.asarray(A.vals)
    nnz_np = np.asarray(A.nnz)
    T = A.n_slices
    N = A.n_nodes

    # Global sorted entry stream.
    parts_r, parts_c, parts_v = [], [], []
    for t in range(T):
        n = int(nnz_np[t])
        parts_r.append(rows_np[t, :n].astype(np.int64) + t * N)
        parts_c.append(cols_np[t, :n].astype(np.int64) + t * N)
        parts_v.append(vals_np[t, :n])
    g_rows = np.concatenate(parts_r) if parts_r else np.zeros(0, np.int64)
    g_cols = np.concatenate(parts_c) if parts_c else np.zeros(0, np.int64)
    g_vals = np.concatenate(parts_v) if parts_v else np.zeros(0, vals_np.dtype)
    return pack_windowed_flat(g_rows, g_cols, g_vals, T * N, chunk, window, sort_cols)


def pack_windowed_flat(
    g_rows: np.ndarray,
    g_cols: np.ndarray,
    g_vals: np.ndarray,
    n_out: int,
    chunk: int = DEFAULT_CHUNK,
    window: int = DEFAULT_WINDOW,
    sort_cols: bool = False,
    all_windows: bool = True,
) -> PackedSpmm:
    """Pack a flat (row, col, val) entry stream for the kernel.

    Rows must be sorted ascending and < n_out (the logical output row
    count — possibly rectangular: cols index a DIFFERENT input space).
    Cuts the stream into chunks of ``chunk`` entries that never cross a
    ``window``-aligned output boundary. Every window gets at least one
    chunk so all output blocks are initialized — unless
    ``all_windows=False``: then only NON-EMPTY windows get chunks and
    the kernel must run with a pre-zeroed aliased output
    (``windowed_segment_matmul(init=...)``). For scatter patterns that
    touch a small fraction of a large output table (the edge-readout
    backward: ~78k rows over T*N=584k on chess), the empty-window
    chunks dominate the kernel's runtime 7x.

    sort_cols=True reorders entries within each output window by column
    id. The one-hot scatter is order-invariant inside a window, but the
    XLA gather of X rows costs one (8, 128) HBM tile per DISTINCT random
    row — column-sorted chunks turn repeated/nearby columns (common in
    graph-local, M-banded adjacency) into same-tile reads.
    """
    g_rows = np.asarray(g_rows, np.int64)
    g_cols = np.asarray(g_cols, np.int64)
    g_vals = np.asarray(g_vals)
    vals_np = g_vals
    n_rows_out = ((n_out + window - 1) // window) * window
    n_windows = n_rows_out // window

    if sort_cols and len(g_rows):
        # Stable (window, col) order: window ids stay monotonic (both
        # packers cut chunks on window change), rows within a window are
        # free to permute.
        order = np.lexsort((g_cols, g_rows // window))
        g_rows, g_cols, g_vals = g_rows[order], g_cols[order], g_vals[order]

    try:
        from tmgcn_tpu import native

        if native.available() and all_windows:
            r, c, v, wid, first = native.pack_chunks(
                g_rows, g_cols, g_vals.astype(np.float64), window, chunk, n_windows
            )
            return PackedSpmm(
                rows=jnp.asarray(r),
                cols=jnp.asarray(c),
                vals=jnp.asarray(v.astype(vals_np.dtype)),
                window_id=jnp.asarray(wid),
                is_first=jnp.asarray(first),
                n_rows_out=int(n_rows_out),
                chunk=chunk,
                window=window,
            )
    except Exception:
        pass  # fall through to the Python packer

    wid_of_entry = g_rows // window
    # Chunk boundaries: entry count or window change. Vectorized over
    # window segments (the per-entry Python loop cost seconds at LP
    # edge counts).
    chunks_rows, chunks_cols, chunks_vals, chunk_wid = [], [], [], []
    P = len(g_rows)
    seg_bounds = np.concatenate([
        [0], np.flatnonzero(np.diff(wid_of_entry)) + 1, [P]
    ]).astype(np.int64) if P else np.zeros(1, np.int64)
    for i in range(len(seg_bounds) - 1):
        s, e = int(seg_bounds[i]), int(seg_bounds[i + 1])
        if s == e:
            continue
        w = int(wid_of_entry[s])
        for cs in range(s, e, chunk):
            ce = min(cs + chunk, e)
            chunks_rows.append(g_rows[cs:ce])
            chunks_cols.append(g_cols[cs:ce])
            chunks_vals.append(g_vals[cs:ce])
            chunk_wid.append(w)

    if all_windows:
        # Ensure every window is touched at least once.
        touched = set(chunk_wid)
        for w in range(n_windows):
            if w not in touched:
                chunks_rows.append(np.full(0, 0, np.int64))
                chunks_cols.append(np.full(0, 0, np.int64))
                chunks_vals.append(np.zeros(0, g_vals.dtype))
                chunk_wid.append(w)

    # Sort chunks by window so same-window chunks are consecutive (the
    # output block revisit pattern Pallas requires).
    order = np.argsort(np.asarray(chunk_wid), kind="stable")
    J = len(order)
    rows_out = np.zeros((J, chunk), np.int32)
    cols_out = np.zeros((J, chunk), np.int32)
    vals_out = np.zeros((J, chunk), vals_np.dtype)
    wid_out = np.zeros((J,), np.int32)
    first_out = np.zeros((J,), np.int32)
    prev_w = -1
    for j, oi in enumerate(order):
        r, c, v = chunks_rows[oi], chunks_cols[oi], chunks_vals[oi]
        w = chunk_wid[oi]
        n = len(r)
        base = w * window
        rows_out[j, :n] = r - base
        rows_out[j, n:] = 0
        cols_out[j, :n] = c
        cols_out[j, n:] = 0
        vals_out[j, :n] = v
        wid_out[j] = w
        first_out[j] = 1 if w != prev_w else 0
        prev_w = w

    return PackedSpmm(
        rows=jnp.asarray(rows_out),
        cols=jnp.asarray(cols_out),
        vals=jnp.asarray(vals_out),
        window_id=jnp.asarray(wid_out),
        is_first=jnp.asarray(first_out),
        n_rows_out=int(n_rows_out),
        chunk=chunk,
        window=window,
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["rows", "uidx", "tiles", "vals", "window_id", "is_first"],
    meta_fields=["n_rows_out", "chunk", "window", "ut_cap"],
)
@dataclasses.dataclass(frozen=True)
class PackedTiled:
    """Tile-deduplicated chunk stream (HBM-tile gather dedup).

    Motivation (measured on chess, chunk=256 column-sorted): entries in a
    chunk repeat exact columns only 1.74x, but fall into the same 8-row
    HBM tile 5.8x — the gather's true fetch unit. This packing gathers
    each chunk's DISTINCT 8-row tiles once (as contiguous (8, F) row
    groups, ~3.5x less random-gather traffic at ut_cap=64) and the
    kernel re-expands per-entry rows with a one-hot MXU matmul — the
    "tile-level gather dedup" upside tracked in BASELINE.md.

    rows: (J, C) int32 — window-relative output row per entry (0 pad).
    uidx: (J, C) int32 — per-entry index into the chunk's local gathered
        row block: tile_position * 8 + (col % 8); 0 on padding (val 0).
    tiles: (J, U_t) int32 — distinct global tile ids (col // 8) of the
        chunk, padded with 0 (padded tiles are never referenced by uidx).
    vals / window_id / is_first / n_rows_out / chunk / window: as
        PackedSpmm. ut_cap: the per-chunk distinct-tile budget U_t —
        chunks are cut early when a 257th entry would exceed it.
    """

    rows: jax.Array
    uidx: jax.Array
    tiles: jax.Array
    vals: jax.Array
    window_id: jax.Array
    is_first: jax.Array
    n_rows_out: int
    chunk: int
    window: int
    ut_cap: int

    @property
    def n_chunks(self) -> int:
        return self.rows.shape[0]


def pack_windowed_tiled_flat(
    g_rows: np.ndarray,
    g_cols: np.ndarray,
    g_vals: np.ndarray,
    n_out: int,
    chunk: int = DEFAULT_CHUNK,
    window: int = DEFAULT_WINDOW,
    ut_cap: int = 64,
    all_windows: bool = True,
) -> PackedTiled:
    """Pack a flat entry stream with per-chunk distinct-tile budgeting.

    Rows must be sorted ascending and < n_out. Entries are re-sorted
    (window, col) — column sorting is REQUIRED here (distinct-tile runs
    must be contiguous) and is also what makes dedup effective. Chunks
    are cut at ``chunk`` entries, at a window boundary, or as soon as
    the distinct-tile count would exceed ``ut_cap``.
    """
    if ut_cap < 1:
        raise ValueError(f"ut_cap must be >= 1, got {ut_cap}")
    g_rows = np.asarray(g_rows, np.int64)
    g_cols = np.asarray(g_cols, np.int64)
    g_vals = np.asarray(g_vals)
    n_rows_out = ((n_out + window - 1) // window) * window
    n_windows = n_rows_out // window

    if len(g_rows):
        order = np.lexsort((g_cols, g_rows // window))
        g_rows, g_cols, g_vals = g_rows[order], g_cols[order], g_vals[order]
    wid_of_entry = g_rows // window
    tid = g_cols // 8

    chunks = []  # (window, slice_start, slice_end)
    P = len(g_rows)
    seg_bounds = np.concatenate([
        [0], np.flatnonzero(np.diff(wid_of_entry)) + 1, [P]
    ]).astype(np.int64) if P else np.zeros(1, np.int64)
    for i in range(len(seg_bounds) - 1):
        s, e = int(seg_bounds[i]), int(seg_bounds[i + 1])
        if s == e:
            continue
        w = int(wid_of_entry[s])
        cs = s
        while cs < e:
            ce = min(cs + chunk, e)
            seg = tid[cs:ce]
            # cols sorted within the window -> distinct tiles are runs;
            # cut where the cumulative run count first exceeds ut_cap.
            distinct = np.empty(len(seg), np.int64)
            if len(seg):
                distinct[0] = 1
                np.cumsum(np.diff(seg) != 0, out=distinct[1:])
                distinct[1:] += 1
                if distinct[-1] > ut_cap:
                    ce = cs + int(np.searchsorted(distinct, ut_cap + 1))
            chunks.append((w, cs, ce))
            cs = ce

    if all_windows:
        touched = {w for w, _, _ in chunks}
        for w in range(n_windows):
            if w not in touched:
                chunks.append((w, 0, 0))

    chunks.sort(key=lambda x: x[0])
    J = len(chunks)
    rows_out = np.zeros((J, chunk), np.int32)
    uidx_out = np.zeros((J, chunk), np.int32)
    tiles_out = np.zeros((J, ut_cap), np.int32)
    vals_out = np.zeros((J, chunk), g_vals.dtype)
    wid_out = np.zeros((J,), np.int32)
    first_out = np.zeros((J,), np.int32)
    prev_w = -1
    for j, (w, cs, ce) in enumerate(chunks):
        n = ce - cs
        if n:
            rows_out[j, :n] = g_rows[cs:ce] - w * window
            uniq = np.unique(tid[cs:ce])  # sorted, == appearance order here
            tiles_out[j, : len(uniq)] = uniq
            pos = np.searchsorted(uniq, tid[cs:ce])
            uidx_out[j, :n] = pos * 8 + (g_cols[cs:ce] % 8)
            vals_out[j, :n] = g_vals[cs:ce]
        wid_out[j] = w
        first_out[j] = 1 if w != prev_w else 0
        prev_w = w

    return PackedTiled(
        rows=jnp.asarray(rows_out),
        uidx=jnp.asarray(uidx_out),
        tiles=jnp.asarray(tiles_out),
        vals=jnp.asarray(vals_out),
        window_id=jnp.asarray(wid_out),
        is_first=jnp.asarray(first_out),
        n_rows_out=int(n_rows_out),
        chunk=chunk,
        window=window,
        ut_cap=ut_cap,
    )


def tiled_estimate(
    g_rows: np.ndarray,
    g_cols: np.ndarray,
    chunk: int = DEFAULT_CHUNK,
    window: int = DEFAULT_WINDOW,
    ut_cap: int = 64,
    feat: int = 128,
    itemsize: int = 2,
    gather_row_s: float = 4.4e-9,
    gather_bw: float = 1.84e11,
    chunk_overhead_s: float = 0.85e-6,
    mxu_eff_tflops: float = 146.0,
) -> dict:
    """Host-side cost model: tiled-dedup vs plain windowed kernel.

    Runs the SAME chunk-cut logic as ``pack_windowed_tiled_flat`` (and
    the plain packer) to count chunks and distinct tiles, then models
    each path's time as max(gather time, kernel time) with constants
    CALIBRATED against tools/kernel_probe.py on the v5e (2026-08-20,
    results/tiled_analysis.md):

      * gather: per random row, max(``gather_row_s``, row_bytes /
        ``gather_bw``) — the gather is ISSUE-bound (~4.4 ns/row
        measured at 256 B rows) up to ~0.8 kB rows, then streams at
        only ~184 GB/s. This is why tiled's 4.5x byte saving does not
        materialize: its rows are 8F wide (2 kB at F=128 bf16) and pay
        ~2.5x per row. Padded tile slots cost real reads (the gathered
        block shape is fixed (ut_cap*8, F)).
      * kernel: per chunk, ``chunk_overhead_s`` (grid step + iota
        one-hot builds + window revisit — the DOMINANT term, fitted
        0.85 us from plain 0.94 us/chunk vs tiled 1.17 us/chunk) plus
        matmul flops at ``mxu_eff_tflops`` (in-kernel achievable, not
        peak). Tiled adds a (C, ut_cap*8) expand matmul per chunk AND
        can only increase the chunk count (ut_cap cuts) — under this
        calibration tiled never wins, which matches every measured
        shape; see results/tiled_analysis.md for the retirement
        analysis.

    Lane padding: the MXU processes 128-wide lanes, so F counts as
    ceil(F/128)*128 in the flop model — at F=6 the expand matmul costs
    as much as F=128 would.  Returns both modeled times and
    ``ratio`` = tiled/plain (< 1 → tiled predicted faster).
    """
    g_rows = np.asarray(g_rows, np.int64)
    g_cols = np.asarray(g_cols, np.int64)
    nnz = len(g_rows)
    if nnz == 0:
        return {"nnz": 0, "ratio": 1.0, "plain_s": 0.0, "tiled_s": 0.0}
    order = np.lexsort((g_cols, g_rows // window))
    g_rows = g_rows[order]
    g_cols = g_cols[order]
    wid_of_entry = g_rows // window
    tid = g_cols // 8
    seg_bounds = np.concatenate(
        [[0], np.flatnonzero(np.diff(wid_of_entry)) + 1, [nnz]]
    ).astype(np.int64)
    j_tiled = 0
    sum_ut = 0
    j_plain = 0
    for i in range(len(seg_bounds) - 1):
        s, e = int(seg_bounds[i]), int(seg_bounds[i + 1])
        if s == e:
            continue
        j_plain += -((s - e) // chunk)  # ceil division
        cs = s
        while cs < e:
            ce = min(cs + chunk, e)
            seg = tid[cs:ce]
            distinct = np.empty(len(seg), np.int64)
            distinct[0] = 1
            np.cumsum(np.diff(seg) != 0, out=distinct[1:])
            distinct[1:] += 1
            if distinct[-1] > ut_cap:
                ce = cs + int(np.searchsorted(distinct, ut_cap + 1))
                sum_ut += ut_cap
            else:
                sum_ut += int(distinct[-1])
            j_tiled += 1
            cs = ce
    f_pad = -((-feat) // 128) * 128
    mxu = mxu_eff_tflops * 1e12
    plain_row_bytes = max(256, feat * itemsize)
    tiled_row_bytes = max(256, 8 * feat * itemsize)
    plain_gather_s = nnz * max(gather_row_s, plain_row_bytes / gather_bw)
    # Padded tile slots are fetched too: the gathered block shape is
    # (J, ut_cap*8, F) regardless of each chunk's actual U_t.
    tiled_gather_s = j_tiled * ut_cap * max(
        gather_row_s, tiled_row_bytes / gather_bw
    )
    plain_flops = 2.0 * j_plain * window * chunk * f_pad
    tiled_flops = 2.0 * j_tiled * chunk * f_pad * (ut_cap * 8 + window)
    plain_kernel_s = j_plain * chunk_overhead_s + plain_flops / mxu
    tiled_kernel_s = j_tiled * chunk_overhead_s + tiled_flops / mxu
    plain_s = max(plain_gather_s, plain_kernel_s)
    tiled_s = max(tiled_gather_s, tiled_kernel_s)
    return {
        "nnz": int(nnz),
        "j_plain": int(j_plain),
        "j_tiled": int(j_tiled),
        "mean_ut": sum_ut / max(j_tiled, 1),
        "tile_dup_factor": nnz / max(sum_ut, 1),
        "plain_gather_s": plain_gather_s,
        "tiled_gather_s": tiled_gather_s,
        "plain_kernel_s": plain_kernel_s,
        "tiled_kernel_s": tiled_kernel_s,
        "plain_flops": plain_flops,
        "tiled_flops": tiled_flops,
        "plain_s": plain_s,
        "tiled_s": tiled_s,
        "plain_bound": "hbm" if plain_gather_s >= plain_kernel_s else "mxu",
        "tiled_bound": "hbm" if tiled_gather_s >= tiled_kernel_s else "mxu",
        "ratio": tiled_s / plain_s if plain_s else 1.0,
    }


def pack_windowed_tiled(
    A: TemporalCOO,
    chunk: int = DEFAULT_CHUNK,
    window: int = DEFAULT_WINDOW,
    ut_cap: int = 64,
) -> PackedTiled:
    """Tile-dedup packing of a temporal COO tensor (host-side, once)."""
    from tmgcn_tpu.ops.spmm_rowsplit import flatten_stream

    g_rows, g_cols, g_vals = flatten_stream(A)
    return pack_windowed_tiled_flat(
        g_rows, g_cols, g_vals, A.n_slices * A.n_nodes, chunk, window, ut_cap
    )


def _tiled_scatter_kernel(
    wid_ref, first_ref, rows_ref, uidx_ref, vals_ref, g_ref, out_ref, *, precision
):
    """One chunk: out_window (+)= onehot(rows) @ (expand(uidx, vals) @ tiles).

    g_ref is the chunk's gathered DISTINCT tile block (U_t*8, F); the
    expand one-hot (C, U_t*8) re-materializes per-entry scaled rows on
    the MXU — trading ~U_t*8/128 extra MXU passes for 3-5x less random
    HBM gather traffic (the kernel's actual bottleneck; BASELINE.md)."""
    j = pl.program_id(0)
    C = rows_ref.shape[-1]
    U8 = g_ref.shape[-2]
    W = out_ref.shape[0]
    rel = rows_ref[0, 0]  # (C,) int32, window-relative
    uid = uidx_ref[0, 0]  # (C,) int32, local gathered-row index
    v_col = vals_ref[0, 0][:, None].astype(g_ref.dtype)  # (C, 1)
    expand = (
        jax.lax.broadcasted_iota(jnp.int32, (C, U8), 1) == uid[:, None]
    ).astype(g_ref.dtype) * v_col
    scaled = jax.lax.dot_general(
        expand,
        g_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=precision,
        # Mosaic requires 32-bit MXU accumulation; cast back to the
        # gather dtype so the scatter matmul keeps bf16 operands (the
        # expand is one-hot-times-val, so this rounds vals*X once —
        # the same precision class as the untiled bf16 path).
        preferred_element_type=jnp.float32,
    ).astype(g_ref.dtype)  # (C, F)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (W, C), 0) == rel[None, :]
    ).astype(g_ref.dtype)
    acc = jax.lax.dot_general(
        onehot,
        scaled,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=precision,
        preferred_element_type=out_ref.dtype,
    )

    @pl.when(first_ref[j] == 1)
    def _():
        out_ref[:] = acc

    @pl.when(first_ref[j] != 1)
    def _():
        out_ref[:] = out_ref[:] + acc


def windowed_tiled_segment_matmul(
    packed: PackedTiled,
    gathered: jax.Array,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
    out_dtype=None,
) -> jax.Array:
    """(J, U_t*8, F) gathered tile blocks -> (n_rows_out, F) segment sums."""
    J, C = packed.rows.shape
    U8 = gathered.shape[-2]
    F = gathered.shape[-1]
    W = packed.window
    out_dtype = gathered.dtype if out_dtype is None else out_dtype
    itemsize = jnp.dtype(gathered.dtype).itemsize

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # window_id, is_first
        grid=(J,),
        in_specs=[
            pl.BlockSpec((1, 1, C), lambda j, wid, first: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda j, wid, first: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda j, wid, first: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U8, F), lambda j, wid, first: (j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (W, F), lambda j, wid, first: (wid[j], 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        partial(_tiled_scatter_kernel, precision=precision),
        out_shape=jax.ShapeDtypeStruct((packed.n_rows_out, F), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * J * (C * U8 + W * C) * F,
            bytes_accessed=J * U8 * F * itemsize + packed.n_rows_out * F * 4,
            transcendentals=0,
        ),
    )(
        packed.window_id,
        packed.is_first,
        packed.rows[:, None, :],
        packed.uidx[:, None, :],
        packed.vals[:, None, :],
        gathered,
    )


def _scatter_kernel(
    wid_ref, first_ref, rows_ref, vals_ref, g_ref, *refs, precision, aliased=False
):
    """One chunk: out_window (+)= onehot(rows)ᵀ-matmul of scaled values.

    With ``aliased`` an extra init ref precedes out_ref (the donated
    zero backing store; never read — first-visit writes overwrite, and
    unvisited windows keep its content)."""
    out_ref = refs[-1]
    j = pl.program_id(0)
    C = rows_ref.shape[-1]
    W = out_ref.shape[0]
    rel = rows_ref[0, 0]  # (C,) int32, window-relative
    # vals stay f32 in memory: Mosaic only supports minor-dim insertion
    # ((C,) -> (C,1)) for 32-bit types, so reshape first, cast after.
    v_col = vals_ref[0, 0][:, None].astype(g_ref.dtype)  # (C, 1)
    scaled = g_ref[0] * v_col  # (C, F)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (W, C), 0) == rel[None, :]
    ).astype(g_ref.dtype)
    # HIGHEST keeps f32 fidelity on the MXU (the one-hot side is exact;
    # DEFAULT rounds the value operand to bf16 — ~20%% faster, fine for
    # production training). With bf16 inputs (gather_dtype="bfloat16"),
    # both operands are exactly representable and the MXU accumulates in
    # f32 via preferred_element_type — the only loss is X's bf16 rounding.
    acc = jax.lax.dot_general(
        onehot,
        scaled,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=precision,
        preferred_element_type=out_ref.dtype,
    )

    @pl.when(first_ref[j] == 1)
    def _():
        out_ref[:] = acc

    @pl.when(first_ref[j] != 1)
    def _():
        out_ref[:] = out_ref[:] + acc


def windowed_segment_matmul(
    packed: PackedSpmm,
    gathered: jax.Array,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
    out_dtype=None,
    init: jax.Array | None = None,
) -> jax.Array:
    """(J, C, F) gathered chunks -> (n_rows_out, F) segment sums.

    out_dtype defaults to gathered.dtype; pass f32 with bf16 chunks for
    bf16-traffic / f32-accumulate operation.

    ``init``: a ZERO (n_rows_out, F) array donated as the output's
    backing store (input_output_aliases). Required when ``packed`` was
    built with all_windows=False — windows without chunks are never
    visited by the grid, so they keep the donated zeros. This turns the
    readout-backward scatter from O(n_windows) chunk launches into
    O(nnz/chunk): 3.85 ms -> sub-ms on the chess (78k-of-584k) shape.
    """
    J, C = packed.rows.shape
    F = gathered.shape[-1]
    W = packed.window
    out_dtype = gathered.dtype if out_dtype is None else out_dtype
    itemsize = jnp.dtype(gathered.dtype).itemsize

    in_specs = [
        pl.BlockSpec((1, 1, C), lambda j, wid, first: (j, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, C), lambda j, wid, first: (j, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C, F), lambda j, wid, first: (j, 0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [
        packed.window_id,
        packed.is_first,
        packed.rows[:, None, :],
        packed.vals[:, None, :],
        gathered,
    ]
    kwargs = {}
    kernel = partial(_scatter_kernel, precision=precision, aliased=init is not None)
    if init is not None:
        in_specs.append(
            pl.BlockSpec(
                (W, F), lambda j, wid, first: (wid[j], 0), memory_space=pltpu.VMEM
            )
        )
        operands.append(init.astype(out_dtype))
        # Alias the init operand to output 0 (indices count ALL inputs,
        # scalar-prefetch included: wid, first, rows, vals, gathered,
        # init): unvisited windows keep its zeros.
        kwargs["input_output_aliases"] = {5: 0}

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # window_id, is_first
        grid=(J,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (W, F), lambda j, wid, first: (wid[j], 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((packed.n_rows_out, F), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * J * W * C * F,
            bytes_accessed=J * C * F * itemsize + packed.n_rows_out * F * 4,
            transcendentals=0,
        ),
        **kwargs,
    )(*operands)


def _scatter_kernel_t(
    wid_ref, first_ref, rows_ref, vals_ref, g_ref, *refs, precision
):
    """Lane-major variant: out block (F, W); gathered chunk (F, C).

    The (n_rows_out, F) output of the standard kernel lives in the
    (8,128)-tiled layout Mosaic requires — at F~6 that pads 21x (15 GB
    at 32M rows, the 500k-node recurrent OOM). Here the output is
    (F, n_rows_out): rows on the LANE axis, F on sublanes (pad 8/F
    only). acc = scaled (F, C) @ onehot (C, W)."""
    out_ref = refs[-1]
    j = pl.program_id(0)
    C = rows_ref.shape[-1]
    W = out_ref.shape[-1]
    rel = rows_ref[0, 0]  # (C,) int32, window-relative
    v_row = vals_ref[0, 0][None, :].astype(g_ref.dtype)  # (1, C)
    scaled = g_ref[0] * v_row  # (F, C)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (C, W), 1) == rel[:, None]
    ).astype(g_ref.dtype)
    acc = jax.lax.dot_general(
        scaled,
        onehot,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=precision,
        preferred_element_type=out_ref.dtype,
    )

    @pl.when(first_ref[j] == 1)
    def _():
        out_ref[:] = acc

    @pl.when(first_ref[j] != 1)
    def _():
        out_ref[:] = out_ref[:] + acc


def windowed_segment_matmul_t(
    packed: PackedSpmm,
    gathered_t: jax.Array,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
    out_dtype=None,
    init: jax.Array | None = None,
) -> jax.Array:
    """(J, F, C) transposed gathered chunks -> (F, n_rows_out) sums.

    The lane-major twin of ``windowed_segment_matmul``: identical math,
    output transposed so huge-row/narrow-F scatters (the readout
    backward at T*N in the tens of millions) avoid the 21x lane-padded
    layout. ``init``: a zero (F, n_rows_out) array donated as backing
    store — required with all_windows=False packings.
    """
    J, C = packed.rows.shape
    F = gathered_t.shape[-2]
    W = packed.window
    out_dtype = gathered_t.dtype if out_dtype is None else out_dtype
    itemsize = jnp.dtype(gathered_t.dtype).itemsize

    in_specs = [
        pl.BlockSpec((1, 1, C), lambda j, wid, first: (j, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, C), lambda j, wid, first: (j, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, F, C), lambda j, wid, first: (j, 0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [
        packed.window_id,
        packed.is_first,
        packed.rows[:, None, :],
        packed.vals[:, None, :],
        gathered_t,
    ]
    kwargs = {}
    if init is not None:
        in_specs.append(
            pl.BlockSpec(
                (F, W), lambda j, wid, first: (0, wid[j]), memory_space=pltpu.VMEM
            )
        )
        operands.append(init.astype(out_dtype))
        kwargs["input_output_aliases"] = {5: 0}

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(J,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (F, W), lambda j, wid, first: (0, wid[j]), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        partial(_scatter_kernel_t, precision=precision),
        out_shape=jax.ShapeDtypeStruct((F, packed.n_rows_out), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * J * W * C * F,
            bytes_accessed=J * C * F * itemsize + packed.n_rows_out * F * 4,
            transcendentals=0,
        ),
        **kwargs,
    )(*operands)


def _flat_fwd_impl(n_out, fast, interpret, gather_dtype, packed, flat):
    F = flat.shape[-1]
    out_dtype = flat.dtype
    if gather_dtype is not None:
        # Cast BEFORE the gather: the random-row gather is the dominant
        # HBM traffic, so moving it in bf16 halves the bottleneck. The
        # kernel accumulates in X.dtype on the MXU (bf16 operands are
        # exact there); only X's bf16 rounding is lost.
        flat = flat.astype(gather_dtype)
    precision = (
        jax.lax.Precision.DEFAULT
        if (fast or gather_dtype is not None)
        else jax.lax.Precision.HIGHEST
    )
    if isinstance(packed, PackedTiled):
        # Gather DISTINCT 8-row HBM tiles once per chunk (contiguous
        # (8, F) row groups via a reshape to 8F-wide rows); the kernel
        # re-expands per-entry rows on the MXU. 3-5x less random gather
        # traffic on graph-local patterns (PackedTiled docstring).
        #
        # Pad to a multiple of 64 flat rows, NOT 8: the reshaped gather
        # source then has a sublane-aligned (multiple-of-8) row count.
        # On this libtpu (v5e/axon) a gather from an UNALIGNED-row
        # source (e.g. chess T*N=584080 -> 73010 rows of 8F) CRASHES
        # the TPU worker whenever the program contains more than one
        # consumer of the kernel (any composition/training step);
        # single applies run and are bit-correct. Measured 2026-08-20;
        # the pad costs <64 zero rows and removes the fault entirely.
        pad = (-flat.shape[0]) % 64
        if pad:
            flat = jnp.pad(flat, ((0, pad), (0, 0)))
        J, U_t = packed.tiles.shape
        gathered = (
            flat.reshape(-1, 8 * F)[packed.tiles.reshape(-1)]
            .reshape(J, U_t * 8, F)
        )
        out = windowed_tiled_segment_matmul(
            packed, gathered, precision, interpret, out_dtype=out_dtype
        )
        return out[:n_out]
    gathered = flat[packed.cols.reshape(-1)].reshape(packed.n_chunks, packed.chunk, F)
    out = windowed_segment_matmul(
        packed, gathered, precision, interpret, out_dtype=out_dtype
    )
    return out[:n_out]


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _flat_spmm(n_in, n_out, fast, interpret, gather_dtype, packed, packed_t, flat):
    """(n_in, F) -> (n_out, F); backward routes dX = Aᵀ dY via packed_t."""
    return _flat_fwd_impl(n_out, fast, interpret, gather_dtype, packed, flat)


def _flat_spmm_fwd(n_in, n_out, fast, interpret, gather_dtype, packed, packed_t, flat):
    out = _flat_fwd_impl(n_out, fast, interpret, gather_dtype, packed, flat)
    return out, (packed, packed_t)


def _flat_spmm_bwd(n_in, n_out, fast, interpret, gather_dtype, res, dY):
    packed, packed_t = res
    dX = _flat_fwd_impl(n_in, fast, interpret, gather_dtype, packed_t, dY)
    return _zero_cotangent(packed), _zero_cotangent(packed_t), dX


def _spmm_packed_fwd_impl(T, N, fast, interpret, gather_dtype, packed, X):
    F = X.shape[-1]
    flat = X.reshape(T * N, F)
    return _flat_fwd_impl(T * N, fast, interpret, gather_dtype, packed, flat).reshape(
        T, N, F
    )


def _zero_cotangent(tree):
    """Symbolic-zero cotangents for a (possibly integer) pytree."""
    import numpy as _np

    def one(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.zeros_like(x)
        return _np.zeros(x.shape, dtype=jax.dtypes.float0)

    return jax.tree.map(one, tree)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _spmm_packed(T, N, fast, interpret, gather_dtype, packed, packed_t, X):
    return _spmm_packed_fwd_impl(T, N, fast, interpret, gather_dtype, packed, X)


def _spmm_packed_fwd(T, N, fast, interpret, gather_dtype, packed, packed_t, X):
    out = _spmm_packed_fwd_impl(T, N, fast, interpret, gather_dtype, packed, X)
    return out, (packed, packed_t)


def _spmm_packed_bwd(T, N, fast, interpret, gather_dtype, res, dY):
    packed, packed_t = res
    # dX = Aᵀ dY via the transposed packing; A itself is non-trainable.
    dX = _spmm_packed_fwd_impl(T, N, fast, interpret, gather_dtype, packed_t, dY)
    return _zero_cotangent(packed), _zero_cotangent(packed_t), dX


_spmm_packed.defvjp(_spmm_packed_fwd, _spmm_packed_bwd)
_flat_spmm.defvjp(_flat_spmm_fwd, _flat_spmm_bwd)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["packed", "packed_t"],
    meta_fields=["n_in", "n_out", "fast", "interpret", "gather_dtype"],
)
@dataclasses.dataclass(frozen=True)
class FlatPallasOperator:
    """A prepacked RECTANGULAR flat operator: (n_in, F) -> (n_out, F).

    Same kernel as PallasSpmmOperator but over an arbitrary (row, col)
    entry stream whose rows index a different (smaller) space than its
    columns — e.g. the readout-restricted layer-2 operator (endpoint
    rows x used in-neighbor rows) of tasks/adapters.py.
    """

    n_in: int
    n_out: int
    packed: PackedSpmm | PackedTiled
    packed_t: PackedSpmm | PackedTiled
    fast: bool = False
    interpret: bool = False
    gather_dtype: str | None = None

    def __call__(self, flat: jax.Array) -> jax.Array:
        return _flat_spmm(
            self.n_in,
            self.n_out,
            self.fast,
            self.interpret,
            self.gather_dtype,
            self.packed,
            self.packed_t,
            flat,
        )


def make_flat_operator(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    n_in: int,
    n_out: int,
    chunk: int = DEFAULT_CHUNK,
    window: int = DEFAULT_WINDOW,
    fast: bool = False,
    interpret: bool | None = None,
    gather_dtype: str | None = None,
    sort_cols: bool = False,
    tile_dedup: bool = False,
    ut_cap: int = 64,
) -> FlatPallasOperator:
    """Prepack a rectangular flat operator (host-side, once).

    rows (< n_out) need not be pre-sorted; the stream is row-sorted here.
    The transpose packing (cols as rows, < n_in) powers the backward.
    tile_dedup packs with per-chunk distinct-HBM-tile gather dedup
    (PackedTiled); sort_cols is implied there.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    vals = np.asarray(vals)
    order = np.argsort(rows, kind="stable")
    order_t = np.argsort(cols, kind="stable")
    if tile_dedup:
        packed = pack_windowed_tiled_flat(
            rows[order], cols[order], vals[order], n_out, chunk, window, ut_cap
        )
        packed_t = pack_windowed_tiled_flat(
            cols[order_t], rows[order_t], vals[order_t], n_in, chunk, window, ut_cap
        )
    else:
        packed = pack_windowed_flat(
            rows[order], cols[order], vals[order], n_out, chunk, window, sort_cols
        )
        packed_t = pack_windowed_flat(
            cols[order_t], rows[order_t], vals[order_t], n_in, chunk, window, sort_cols
        )
    return FlatPallasOperator(
        n_in=int(n_in),
        n_out=int(n_out),
        packed=packed,
        packed_t=packed_t,
        fast=fast,
        interpret=interpret,
        gather_dtype=gather_dtype,
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["packed", "packed_t"],
    meta_fields=["T", "N", "fast", "interpret", "gather_dtype"],
)
@dataclasses.dataclass(frozen=True)
class PallasSpmmOperator:
    """A prepacked SpMM operator: call on (T, N, F) features.

    fast=True uses bf16-rounded MXU accumulation (~20%% faster); the
    default keeps float32 fidelity. gather_dtype="bfloat16" additionally
    moves the gathered feature rows (the dominant HBM traffic) in bf16
    while still accumulating windows in f32 — ~1e-3 relative error, the
    production-training fast path. interpret=True runs the kernel in
    the Pallas interpreter (CPU testing).
    """

    T: int
    N: int
    packed: PackedSpmm | PackedTiled
    packed_t: PackedSpmm | PackedTiled
    fast: bool = False
    interpret: bool = False
    gather_dtype: str | None = None

    @property
    def n_slices(self) -> int:
        return self.T

    @property
    def n_nodes(self) -> int:
        return self.N

    def __call__(self, X: jax.Array) -> jax.Array:
        return _spmm_packed(
            self.T,
            self.N,
            self.fast,
            self.interpret,
            self.gather_dtype,
            self.packed,
            self.packed_t,
            X,
        )


def make_operator(
    A: TemporalCOO,
    chunk: int = DEFAULT_CHUNK,
    window: int = DEFAULT_WINDOW,
    fast: bool = False,
    interpret: bool | None = None,
    gather_dtype: str | None = None,
    sort_cols: bool = False,
    tile_dedup: bool = False,
    ut_cap: int = 64,
) -> PallasSpmmOperator:
    """Prepack forward + transpose scatter plans for A (host-side).

    interpret=None auto-selects the Pallas interpreter on non-TPU
    backends (Mosaic kernels only compile for TPU). gather_dtype
    ("bfloat16") streams gathered rows in that dtype with f32 window
    accumulation. sort_cols improves gather tile locality (see
    pack_windowed). tile_dedup gathers each chunk's distinct 8-row HBM
    tiles once and re-expands rows on the MXU (PackedTiled) — a
    gather-dedup engine that wins only when the tile-duplication factor
    outruns the extra expand-matmul cost; use ``tiled_estimate`` (or
    ``ops.spmm.make_auto_operator``) to decide, and see
    results/tiled_analysis.md for measured crossovers.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if tile_dedup:
        packed = pack_windowed_tiled(A, chunk, window, ut_cap)
        packed_t = pack_windowed_tiled(A.transpose(), chunk, window, ut_cap)
    else:
        packed = pack_windowed(A, chunk, window, sort_cols)
        packed_t = pack_windowed(A.transpose(), chunk, window, sort_cols)
    return PallasSpmmOperator(
        T=A.n_slices,
        N=A.n_nodes,
        packed=packed,
        packed_t=packed_t,
        fast=fast,
        interpret=interpret,
        gather_dtype=gather_dtype,
    )


def spmm_pallas(A: TemporalCOO, X: jax.Array) -> jax.Array:
    """One-shot Pallas SpMM (packs on every call — prefer make_operator).

    Requires concrete (non-traced) A; inside jit, prepack with
    ``make_operator`` and close over the operator instead.
    """
    if isinstance(A.rows, jax.core.Tracer):
        raise ValueError(
            "spmm(impl='pallas') needs host-side packing; build a "
            "PallasSpmmOperator with make_operator(A) outside jit"
        )
    return make_operator(A)(X)
