"""Row-split segmented SpMM: packing invariants + fwd/bwd correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmgcn_tpu.core.sparse import TemporalCOO
from tmgcn_tpu.ops.spmm import spmm
from tmgcn_tpu.ops.spmm_rowsplit import make_operator, pack_rowsplit


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    T, N, F = 4, 100, 8
    dense = (rng.random((T, N, N)) < 0.08) * rng.random((T, N, N))
    A = TemporalCOO.from_dense(dense, dtype=jnp.float32, pad_multiple=16)
    X = jnp.asarray(rng.standard_normal((T, N, F)), jnp.float32)
    return A, X, dense


class TestPacking:
    @pytest.mark.parametrize("k", [4, 16])
    def test_invariants(self, setup, k):
        A, _, _ = setup
        plan = pack_rowsplit(A, k=k)
        cols = np.asarray(plan.cols)
        vals = np.asarray(plan.vals)
        seg_rows = np.asarray(plan.seg_rows)
        # No segment spans two output rows; total mass preserved.
        assert seg_rows.min() >= 0 and seg_rows.max() < plan.n_rows_out
        assert np.all(np.diff(seg_rows[vals.any(axis=1)].astype(np.int64)) >= 0)
        np.testing.assert_allclose(vals.sum(), np.asarray(A.vals).sum(), rtol=1e-6)
        n_real = int((vals != 0).sum())
        assert n_real == int(np.asarray(A.nnz).sum())
        assert cols.shape[1] == k

    def test_segment_count(self, setup):
        """Each row with d nonzeros produces ceil(d/k) segments."""
        A, _, _ = setup
        k = 8
        plan = pack_rowsplit(A, k=k)
        rows = np.asarray(A.rows)
        nnz = np.asarray(A.nnz)
        deg = np.zeros(plan.n_rows_out, np.int64)
        for t in range(A.n_slices):
            np.add.at(deg, rows[t, : nnz[t]].astype(np.int64) + t * A.n_nodes, 1)
        expected = int(np.ceil(deg / k).sum())
        real_segments = int(np.asarray(plan.vals).any(axis=1).sum())
        assert real_segments == expected

    def test_empty(self):
        A = TemporalCOO.from_slices(
            [(np.zeros(0), np.zeros(0), np.zeros(0))] * 3, 10, pad_multiple=4
        )
        op = make_operator(A, k=4)
        X = jnp.ones((3, 10, 2), jnp.float32)
        np.testing.assert_allclose(np.asarray(op(X)), 0.0)


class TestOperator:
    @pytest.mark.parametrize("k", [4, 16, 64])
    def test_forward(self, setup, k):
        A, X, dense = setup
        op = make_operator(A, k=k)
        out = op(X)
        ref = jnp.einsum("tij,tjf->tif", jnp.asarray(dense, jnp.float32), X)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_backward(self, setup):
        A, X, _ = setup
        op = make_operator(A, k=16)
        G = jnp.asarray(np.random.default_rng(1).standard_normal(X.shape), jnp.float32)
        dX = jax.grad(lambda x: jnp.vdot(op(x), G))(X)
        dX_ref = jax.grad(lambda x: jnp.vdot(spmm(A, x), G))(X)
        np.testing.assert_allclose(np.asarray(dX), np.asarray(dX_ref), atol=1e-5)

    def test_under_jit_as_argument(self, setup):
        A, X, _ = setup
        op = make_operator(A, k=16)

        @jax.jit
        def f(op, X):
            return spmm(op, X).sum()

        v = float(f(op, X))
        assert np.isfinite(v)

    def test_spmm_dispatch(self, setup):
        A, X, _ = setup
        out = spmm(A, X, impl="rowsplit")
        ref = spmm(A, X, impl="jnp")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


class TestFlatOperator:
    def test_rectangular_matches_dense(self):
        rng = np.random.default_rng(3)
        n_in, n_out, nnz, F = 60, 25, 200, 5
        r = rng.integers(0, n_out, nnz)
        c = rng.integers(0, n_in, nnz)
        v = rng.standard_normal(nnz).astype(np.float32)
        from tmgcn_tpu.ops.spmm_rowsplit import make_flat_operator

        op = make_flat_operator(r, c, v, n_in=n_in, n_out=n_out, k=4)
        X = jnp.asarray(rng.standard_normal((n_in, F)), jnp.float32)
        dense = np.zeros((n_out, n_in), np.float32)
        np.add.at(dense, (r, c), v)
        np.testing.assert_allclose(
            np.asarray(op(X)), dense @ np.asarray(X), atol=1e-5
        )
        # Backward: dX = Aᵀ dY.
        G = jnp.asarray(rng.standard_normal((n_out, F)), jnp.float32)
        dX = jax.grad(lambda x: jnp.vdot(op(x), G))(X)
        np.testing.assert_allclose(
            np.asarray(dX), dense.T @ np.asarray(G), atol=1e-5
        )


class TestRestrictedLayer2:
    def test_fast_path_matches_generic_model(self, setup):
        """The readout-restricted TMGCN2 adapter equals model.apply."""
        from tmgcn_tpu.core.mmatrix import make_m_matrix
        from tmgcn_tpu.models.tmgcn import TMGCN2
        from tmgcn_tpu.tasks.adapters import make_edge_adapter

        A, X, _ = setup
        A = A.astype(jnp.float64)
        X = np.asarray(X, np.float64)
        T, N = A.n_slices, A.n_nodes
        rng = np.random.default_rng(4)
        M = make_m_matrix(T, 2)
        edges = np.stack(
            [rng.integers(0, T, 70), rng.integers(0, N, 70), rng.integers(0, N, 70)]
        )
        model = TMGCN2(
            n_slices=T, in_feat=X.shape[-1], hidden_feat=(5, 4, 2), nonlin2="selu",
            dtype=jnp.float64,
        )
        adapter = make_edge_adapter(
            model,
            {w: A for w in ("train", "val", "test")},
            {w: np.asarray(X) for w in ("train", "val", "test")},
            {w: edges for w in ("train", "val", "test")},
            M=M,
        )
        variables = adapter.init(jax.random.PRNGKey(1))
        fast, _ = adapter.apply(variables, adapter.bundles["train"], ())
        generic = model.apply(
            variables,
            A,
            jnp.asarray(X, jnp.float64),
            jnp.asarray(edges),
            jnp.asarray(M, jnp.float64),
        )
        np.testing.assert_allclose(
            np.asarray(fast), np.asarray(generic), atol=1e-12
        )


class TestModelIntegration:
    def test_tmgcn2_rowsplit_matches_jnp(self, setup):
        """TMGCN2 with spmm_impl='rowsplit' reproduces the jnp path."""
        from tmgcn_tpu.core.mmatrix import make_m_matrix
        from tmgcn_tpu.models.tmgcn import TMGCN2
        from tmgcn_tpu.tasks.adapters import make_edge_adapter

        A, X, _ = setup
        T, N = A.n_slices, A.n_nodes
        rng = np.random.default_rng(2)
        M = make_m_matrix(T, 2)
        edges = np.stack(
            [rng.integers(0, T, 50), rng.integers(0, N, 50), rng.integers(0, N, 50)]
        )
        outs = {}
        for impl in ("jnp", "rowsplit"):
            model = TMGCN2(
                n_slices=T, in_feat=X.shape[-1], hidden_feat=(4, 4, 2),
                spmm_impl=impl,
            )
            adapter = make_edge_adapter(
                model,
                {w: A for w in ("train", "val", "test")},
                {w: np.asarray(X) for w in ("train", "val", "test")},
                {w: edges for w in ("train", "val", "test")},
                M=M,
            )
            variables = adapter.init(jax.random.PRNGKey(0))
            out, _ = adapter.apply(variables, adapter.bundles["train"], ())
            outs[impl] = np.asarray(out)
        np.testing.assert_allclose(outs["rowsplit"], outs["jnp"], atol=1e-5)
