"""Profiling and roofline accounting.

The reference imports cProfile everywhere and never calls it (SURVEY.md
§5). Here: a JAX-profiler trace helper (view in TensorBoard / Perfetto)
and analytic cost models for the framework's hot ops, so measured kernel
times can be expressed as a fraction of the hardware roofline.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import jax
import numpy as np

# TPU v5e (1 chip) peak numbers; override for other targets.
PEAK_FLOPS_F32 = 98e12
PEAK_FLOPS_BF16 = 197e12
PEAK_HBM_BYTES = 820e9


@dataclasses.dataclass(frozen=True)
class OpCost:
    flops: float
    hbm_bytes: float

    def roofline_seconds(
        self, peak_flops: float = PEAK_FLOPS_F32, peak_bw: float = PEAK_HBM_BYTES
    ) -> float:
        """Time lower bound: max of compute-bound and bandwidth-bound."""
        return max(self.flops / peak_flops, self.hbm_bytes / peak_bw)

    def roofline_fraction(self, measured_seconds: float, **kw) -> float:
        return self.roofline_seconds(**kw) / measured_seconds


def spmm_gather_bound(nnz: int, tile_bytes: int = 4096,
                      peak_bw: float = PEAK_HBM_BYTES) -> float:
    """Seconds floor for gather-based SpMM with random column access.

    TPU HBM moves (8, 128)-tiled data: fetching one feature row by a
    random index costs a whole ~4 kB tile regardless of F or dtype
    (measured: tools/kernel_probe.py gather_only ~3.9 ns/row at both f32
    and bf16). Any SpMM built on a per-nonzero gather is bounded by one
    tile per nonzero — the honest roofline when columns lack tile
    locality; `spmm_cost` is the idealized (unreachable) byte count.
    """
    return nnz * tile_bytes / peak_bw


def spmm_cost(nnz: int, n_rows: int, feat: int, dtype_bytes: int = 4) -> OpCost:
    """Gather/scale/segment-reduce SpMM: 2*nnz*F FLOPs.

    HBM traffic lower bound: indices + values once, one feature row read
    per nonzero (worst case, no reuse), output written once.
    """
    return OpCost(
        flops=2.0 * nnz * feat,
        hbm_bytes=nnz * (8 + dtype_bytes) + nnz * feat * dtype_bytes
        + n_rows * feat * dtype_bytes,
    )


def m_transform_cost(T: int, n_nodes: int, feat: int, band: int | None = None,
                     dtype_bytes: int = 4) -> OpCost:
    """(T, T) x (T, N*F) matmul; banded M does band*T*N*F MACs."""
    k = band if band is not None else T
    return OpCost(
        flops=2.0 * k * T * n_nodes * feat,
        hbm_bytes=2 * T * n_nodes * feat * dtype_bytes + T * T * dtype_bytes,
    )


def edge_readout_cost(n_edges: int, feat: int, n_classes: int,
                      dtype_bytes: int = 4) -> OpCost:
    return OpCost(
        flops=2.0 * n_edges * 2 * feat * n_classes,
        hbm_bytes=n_edges * (2 * feat + n_classes) * dtype_bytes,
    )


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a JAX profiler trace (TensorBoard / xprof format)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def measure(fn, *args, iters: int = 30) -> float:
    """Steady-state seconds per call; forces completion via scalar fetch.

    ``fn`` should return an array; a device-side reduction to one scalar
    is fetched so remote-accelerator timing is honest (plain
    block_until_ready can return early through an RPC tunnel).
    """
    out = fn(*args)
    _ = float(jax.numpy.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.numpy.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters
