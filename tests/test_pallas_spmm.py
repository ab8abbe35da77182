"""Pallas SpMM kernel: packing invariants + interpret-mode correctness.

The kernel itself targets TPU; on the CPU test mesh it runs through the
Pallas interpreter (same lowering semantics, no Mosaic), checking the
packing, the windowed one-hot accumulation, and the custom VJP against
the dense/jnp oracles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmgcn_tpu.core.sparse import TemporalCOO
from tmgcn_tpu.kernels.spmm_pallas import make_operator, pack_windowed
from tmgcn_tpu.ops.spmm import spmm


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    T, N, F = 4, 100, 8
    dense = (rng.random((T, N, N)) < 0.08) * rng.random((T, N, N))
    A = TemporalCOO.from_dense(dense, dtype=jnp.float32, pad_multiple=16)
    X = jnp.asarray(rng.standard_normal((T, N, F)), jnp.float32)
    return A, X, dense


class TestPacking:
    def test_invariants(self, setup):
        A, X, dense = setup
        packed = pack_windowed(A, chunk=64, window=64)
        rows = np.asarray(packed.rows)
        wid = np.asarray(packed.window_id)
        first = np.asarray(packed.is_first)
        vals = np.asarray(packed.vals)
        # Window-relative rows stay inside the window.
        assert rows.min() >= 0 and rows.max() < 64
        # Windows appear in nondecreasing order; each starts with is_first.
        assert np.all(np.diff(wid) >= 0)
        changes = np.nonzero(np.diff(wid))[0] + 1
        assert first[0] == 1 and np.all(first[changes] == 1)
        # Every window of the output space is covered.
        n_windows = packed.n_rows_out // 64
        assert set(wid.tolist()) == set(range(n_windows))
        # Total mass preserved.
        np.testing.assert_allclose(vals.sum(), np.asarray(A.vals).sum(), rtol=1e-6)

    def test_total_entries(self, setup):
        A, _, _ = setup
        packed = pack_windowed(A, chunk=64, window=64)
        n_real = int((np.asarray(packed.vals) != 0).sum())
        assert n_real == int(np.asarray(A.nnz).sum())


class TestKernelInterpret:
    def test_forward(self, setup):
        A, X, dense = setup
        op = make_operator(A, chunk=64, window=64, interpret=True)
        out = op(X)
        ref = spmm(A, X)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_backward(self, setup):
        A, X, dense = setup
        op = make_operator(A, chunk=64, window=64, interpret=True)
        G = jnp.asarray(np.random.default_rng(1).standard_normal(X.shape), jnp.float32)
        dX = jax.grad(lambda x: jnp.vdot(op(x), G))(X)
        dX_ref = jax.grad(lambda x: jnp.vdot(spmm(A, x), G))(X)
        np.testing.assert_allclose(np.asarray(dX), np.asarray(dX_ref), atol=1e-5)

    def test_under_jit_as_argument(self, setup):
        A, X, _ = setup
        op = make_operator(A, chunk=64, window=64, interpret=True)

        @jax.jit
        def f(op, X):
            return spmm(op, X).sum()

        v = float(f(op, X))
        assert np.isfinite(v)

    def test_model_integration(self, setup):
        from tmgcn_tpu.core.mmatrix import make_m_matrix
        from tmgcn_tpu.models.tmgcn import TMGCN

        A, X, _ = setup
        T = A.n_slices
        M = jnp.asarray(make_m_matrix(T, 3), jnp.float32)
        edges = jnp.asarray(
            np.stack([np.random.default_rng(2).integers(0, T, 20),
                      np.random.default_rng(3).integers(0, 100, 20),
                      np.random.default_rng(4).integers(0, 100, 20)]).astype(np.int32)
        )
        model = TMGCN(n_slices=T, in_feat=8, hidden_feat=(4, 2))
        v = model.init(jax.random.PRNGKey(0))
        op = make_operator(A, chunk=64, window=64, interpret=True)
        out_op = model.apply(v, op, X, edges, M)
        out_coo = model.apply(v, A, X, edges, M)
        np.testing.assert_allclose(np.asarray(out_op), np.asarray(out_coo), atol=1e-4)


class TestBf16Gather:
    def test_forward_close_to_f32(self, setup):
        """gather_dtype=bf16: f32-accumulated result within bf16 rounding."""
        A, X, dense = setup
        op = make_operator(A, chunk=64, window=64, interpret=True,
                           gather_dtype="bfloat16")
        out = np.asarray(op(X))
        assert out.dtype == np.float32  # accumulation/output stay f32
        ref = np.asarray(spmm(A, X))
        # Error budget: X and vals are bf16-rounded (2^-8 relative each),
        # accumulation exact in f32.
        scale = np.abs(ref).max()
        np.testing.assert_allclose(out, ref, atol=2e-2 * scale)
        # And it must be measurably *different* from exact (i.e. the
        # bf16 path was actually taken).
        assert np.abs(out - ref).max() > 0

    def test_backward_close_to_f32(self, setup):
        A, X, dense = setup
        op = make_operator(A, chunk=64, window=64, interpret=True,
                           gather_dtype="bfloat16")
        G = jnp.asarray(np.random.default_rng(5).standard_normal(X.shape), jnp.float32)
        dX = np.asarray(jax.grad(lambda x: jnp.vdot(op(x), G))(X))
        dX_ref = np.asarray(jax.grad(lambda x: jnp.vdot(spmm(A, x), G))(X))
        scale = np.abs(dX_ref).max()
        np.testing.assert_allclose(dX, dX_ref, atol=2e-2 * scale)


class TestSortCols:
    def test_forward_exact_vs_unsorted(self, setup):
        """Column-sorted packing computes the same sums (f32, reordered
        adds may differ by float assoc — compare loosely) and exactly
        preserves the entry multiset."""
        from tmgcn_tpu.kernels.spmm_pallas import pack_windowed

        A, X, dense = setup
        p0 = pack_windowed(A, chunk=64, window=64)
        p1 = pack_windowed(A, chunk=64, window=64, sort_cols=True)
        # Same multiset of (global_row, col, val) triples.
        def triples(p):
            r = np.asarray(p.rows) + np.asarray(p.window_id)[:, None] * 64
            c = np.asarray(p.cols)
            v = np.asarray(p.vals)
            keep = v.ravel() != 0
            return sorted(zip(r.ravel()[keep], c.ravel()[keep], v.ravel()[keep]))
        assert triples(p0) == triples(p1)

        op = make_operator(A, chunk=64, window=64, interpret=True, sort_cols=True)
        out = np.asarray(op(X))
        ref = np.asarray(spmm(A, X))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_backward(self, setup):
        A, X, dense = setup
        op = make_operator(A, chunk=64, window=64, interpret=True, sort_cols=True)
        G = jnp.asarray(np.random.default_rng(7).standard_normal(X.shape), jnp.float32)
        dX = jax.grad(lambda x: jnp.vdot(op(x), G))(X)
        dX_ref = jax.grad(lambda x: jnp.vdot(spmm(A, x), G))(X)
        np.testing.assert_allclose(np.asarray(dX), np.asarray(dX_ref), atol=1e-5)


class TestFlatRectangular:
    """The rectangular flat operator (restricted layer-2 path) vs dense."""

    def test_forward_backward_vs_dense(self):
        from tmgcn_tpu.kernels.spmm_pallas import make_flat_operator

        rng = np.random.default_rng(11)
        n_in, n_out, nnz, F = 210, 75, 600, 5
        r = rng.integers(0, n_out, nnz)
        c = rng.integers(0, n_in, nnz)
        v = rng.standard_normal(nnz).astype(np.float32)
        op = make_flat_operator(
            r, c, v, n_in=n_in, n_out=n_out, chunk=64, window=64,
            interpret=True, sort_cols=True,
        )
        X = jnp.asarray(rng.standard_normal((n_in, F)), jnp.float32)
        dense = np.zeros((n_out, n_in), np.float32)
        np.add.at(dense, (r, c), v)
        np.testing.assert_allclose(
            np.asarray(op(X)), dense @ np.asarray(X), atol=1e-4
        )
        G = jnp.asarray(rng.standard_normal((n_out, F)), jnp.float32)
        dX = jax.grad(lambda x: jnp.vdot(op(x), G))(X)
        np.testing.assert_allclose(
            np.asarray(dX), dense.T @ np.asarray(G), atol=1e-4
        )

    def test_under_jit_as_argument(self):
        from tmgcn_tpu.kernels.spmm_pallas import make_flat_operator

        rng = np.random.default_rng(12)
        n_in, n_out, nnz, F = 100, 40, 150, 3
        r = rng.integers(0, n_out, nnz)
        c = rng.integers(0, n_in, nnz)
        v = rng.standard_normal(nnz).astype(np.float32)
        op = make_flat_operator(
            r, c, v, n_in=n_in, n_out=n_out, chunk=32, window=32, interpret=True
        )
        X = jnp.asarray(rng.standard_normal((n_in, F)), jnp.float32)
        out = jax.jit(lambda o, x: o(x))(op, X)
        dense = np.zeros((n_out, n_in), np.float32)
        np.add.at(dense, (r, c), v)
        np.testing.assert_allclose(np.asarray(out), dense @ np.asarray(X), atol=1e-4)


class TestTileDedup:
    """tile_dedup=True (PackedTiled): forward + VJP vs the jnp oracle."""

    def test_forward(self, setup):
        A, X, dense = setup
        op = make_operator(A, chunk=64, window=64, interpret=True,
                           tile_dedup=True)
        out = op(X)
        ref = spmm(A, X)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_backward(self, setup):
        A, X, dense = setup
        op = make_operator(A, chunk=64, window=64, interpret=True,
                           tile_dedup=True)
        G = jnp.asarray(np.random.default_rng(21).standard_normal(X.shape),
                        jnp.float32)
        dX = jax.grad(lambda x: jnp.vdot(op(x), G))(X)
        dX_ref = jax.grad(lambda x: jnp.vdot(spmm(A, x), G))(X)
        np.testing.assert_allclose(np.asarray(dX), np.asarray(dX_ref), atol=1e-5)

    def test_small_ut_cap_forces_cuts(self, setup):
        """A tiny distinct-tile budget forces early chunk cuts; the
        result must not change."""
        A, X, dense = setup
        op = make_operator(A, chunk=64, window=64, interpret=True,
                           tile_dedup=True, ut_cap=4)
        assert op.packed.n_chunks > make_operator(
            A, chunk=64, window=64, interpret=True, tile_dedup=True
        ).packed.n_chunks
        np.testing.assert_allclose(
            np.asarray(op(X)), np.asarray(spmm(A, X)), atol=1e-5
        )

    def test_duplicate_entries(self):
        """Repeated (row, col) pairs — heavy same-tile duplication, the
        pattern the dedup targets — accumulate correctly."""
        from tmgcn_tpu.kernels.spmm_pallas import make_flat_operator

        rng = np.random.default_rng(23)
        n, nnz, F = 96, 500, 5
        r = rng.integers(0, n, nnz)
        c = rng.integers(0, 16, nnz)  # columns crowd into 2 tiles
        v = rng.standard_normal(nnz).astype(np.float32)
        op = make_flat_operator(
            r, c, v, n_in=n, n_out=n, chunk=32, window=32,
            interpret=True, tile_dedup=True, ut_cap=8,
        )
        X = jnp.asarray(rng.standard_normal((n, F)), jnp.float32)
        dense = np.zeros((n, n), np.float32)
        np.add.at(dense, (r, c), v)
        np.testing.assert_allclose(
            np.asarray(op(X)), dense @ np.asarray(X), atol=1e-4
        )
        G = jnp.asarray(rng.standard_normal((n, F)), jnp.float32)
        dX = jax.grad(lambda x: jnp.vdot(op(x), G))(X)
        np.testing.assert_allclose(
            np.asarray(dX), dense.T @ np.asarray(G), atol=1e-4
        )

    def test_bf16_gather(self, setup):
        A, X, dense = setup
        op = make_operator(A, chunk=64, window=64, interpret=True,
                           tile_dedup=True, gather_dtype="bfloat16")
        out = np.asarray(op(X))
        assert out.dtype == np.float32
        ref = np.asarray(spmm(A, X))
        np.testing.assert_allclose(out, ref, atol=2e-2 * np.abs(ref).max())

    def test_under_jit_as_argument(self, setup):
        A, X, _ = setup
        op = make_operator(A, chunk=64, window=64, interpret=True,
                           tile_dedup=True)
        v = float(jax.jit(lambda o, x: spmm(o, x).sum())(op, X))
        ref = float(spmm(A, X).sum())
        assert abs(v - ref) < 1e-3 * max(abs(ref), 1.0)

    def test_ut_cap_validation(self):
        from tmgcn_tpu.kernels.spmm_pallas import pack_windowed_tiled_flat

        with pytest.raises(ValueError, match="ut_cap"):
            pack_windowed_tiled_flat(
                np.array([0, 1]), np.array([0, 1]),
                np.ones(2, np.float32), 64, ut_cap=0,
            )

    def test_uidx_references_real_tiles(self, setup):
        """Packing invariant: every entry's uidx points at a tile slot
        that holds its column's tile id."""
        from tmgcn_tpu.kernels.spmm_pallas import pack_windowed_tiled

        A, _, _ = setup
        p = pack_windowed_tiled(A, chunk=64, window=64, ut_cap=16)
        rows = np.asarray(p.rows)
        uidx = np.asarray(p.uidx)
        tiles = np.asarray(p.tiles)
        vals = np.asarray(p.vals)
        wid = np.asarray(p.window_id)
        # Reconstruct each real entry's global column and compare with
        # the original multiset.
        recon = []
        for j in range(p.n_chunks):
            for k in range(p.chunk):
                if vals[j, k] == 0:
                    continue
                col = tiles[j, uidx[j, k] // 8] * 8 + uidx[j, k] % 8
                recon.append((wid[j] * p.window + rows[j, k], col, vals[j, k]))
        T, N = A.n_slices, A.n_nodes
        rows_np, cols_np, vals_np = (np.asarray(A.rows), np.asarray(A.cols),
                                     np.asarray(A.vals))
        nnz_np = np.asarray(A.nnz)
        orig = []
        for t in range(T):
            n = int(nnz_np[t])
            for i in range(n):
                orig.append((t * N + rows_np[t, i], t * N + cols_np[t, i],
                             vals_np[t, i]))
        assert sorted(recon) == sorted(orig)


class TestTiledEstimate:
    def test_model_fields_and_dup_factor(self, setup):
        from tmgcn_tpu.kernels.spmm_pallas import tiled_estimate
        from tmgcn_tpu.ops.spmm_rowsplit import flatten_stream

        A, _, _ = setup
        g_r, g_c, _ = flatten_stream(A)
        est = tiled_estimate(g_r, g_c, chunk=64, window=64, ut_cap=16, feat=8)
        assert est["nnz"] == int(np.asarray(A.nnz).sum())
        assert est["tile_dup_factor"] >= 1.0
        assert est["ratio"] > 0
        assert est["plain_bound"] in ("hbm", "mxu")
        # Crowded columns (few tiles) must show a larger dup factor than
        # the spread graph.
        rng = np.random.default_rng(3)
        r2 = np.sort(rng.integers(0, 1000, 5000))
        c2 = rng.integers(0, 32, 5000)
        est2 = tiled_estimate(r2, c2, chunk=256, window=256, feat=128)
        assert est2["tile_dup_factor"] > est["tile_dup_factor"]

    def test_empty(self):
        from tmgcn_tpu.kernels.spmm_pallas import tiled_estimate

        est = tiled_estimate(np.zeros(0, np.int64), np.zeros(0, np.int64))
        assert est["ratio"] == 1.0


class TestSparseWindowPacking:
    """pack_windowed_flat(all_windows=False): only non-empty windows."""

    def test_chunk_counts(self):
        import numpy as np

        from tmgcn_tpu.kernels.spmm_pallas import pack_windowed_flat

        rng = np.random.default_rng(0)
        n_out = 4096
        rows = np.sort(rng.choice(512, 300, replace=True))  # first 2 windows only
        cols = rng.integers(0, 1000, 300)
        vals = np.ones(300, np.float32)
        dense = pack_windowed_flat(rows, cols, vals, n_out, chunk=256, window=256)
        sparse = pack_windowed_flat(
            rows, cols, vals, n_out, chunk=256, window=256, all_windows=False
        )
        n_windows = n_out // 256
        assert dense.rows.shape[0] >= n_windows  # one chunk per window
        # sparse: only the touched windows (rows < 512 -> 2 windows).
        assert sparse.rows.shape[0] <= 4
        touched = set(np.asarray(sparse.window_id).tolist())
        assert touched == {0, 1}

    def test_sparse_matches_dense_with_init(self):
        import jax.numpy as jnp
        import numpy as np

        from tmgcn_tpu.kernels.spmm_pallas import (
            pack_windowed_flat,
            windowed_segment_matmul,
        )

        rng = np.random.default_rng(1)
        n_out, E, F = 2048, 150, 8
        rows = np.sort(rng.choice(300, E, replace=True))
        cols = np.arange(E)
        vals = rng.standard_normal(E).astype(np.float32)
        g = rng.standard_normal((E, F)).astype(np.float32)

        dense = pack_windowed_flat(rows, cols, vals, n_out, chunk=64, window=128)
        gathered_d = jnp.asarray(g[np.asarray(dense.cols).reshape(-1)]).reshape(
            dense.rows.shape[0], 64, F
        )
        out_d = windowed_segment_matmul(dense, gathered_d, interpret=True)

        sparse = pack_windowed_flat(
            rows, cols, vals, n_out, chunk=64, window=128, all_windows=False
        )
        gathered_s = jnp.asarray(g[np.asarray(sparse.cols).reshape(-1)]).reshape(
            sparse.rows.shape[0], 64, F
        )
        out_s = windowed_segment_matmul(
            sparse, gathered_s, interpret=True,
            init=jnp.zeros((sparse.n_rows_out, F), jnp.float32),
        )
        np.testing.assert_allclose(
            np.asarray(out_s), np.asarray(out_d), atol=1e-5
        )
