"""Block-dense SpMM operator: oracle parity, modes, guards, autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmgcn_tpu.ops.spmm_blockdense import (
    BlockDenseOperator,
    estimate,
    make_flat_operator,
)


def _random_stream(rng, n_out, n_in, nnz, clustered=True):
    if clustered:
        # Block-local pattern (what the real operators look like).
        centers_r = rng.integers(0, n_out, nnz // 16 + 1)
        centers_c = rng.integers(0, n_in, nnz // 16 + 1)
        pick = rng.integers(0, len(centers_r), nnz)
        rows = np.clip(centers_r[pick] + rng.integers(-40, 40, nnz), 0, n_out - 1)
        cols = np.clip(centers_c[pick] + rng.integers(-40, 40, nnz), 0, n_in - 1)
    else:
        rows = rng.integers(0, n_out, nnz)
        cols = rng.integers(0, n_in, nnz)
    vals = rng.standard_normal(nnz).astype(np.float32)
    return rows, cols, vals


def _dense(rows, cols, vals, n_out, n_in):
    D = np.zeros((n_out, n_in), np.float64)
    np.add.at(D, (rows, cols), vals)
    return D


@pytest.mark.parametrize("mode,tol", [("exact", 1e-5), ("fast", 1e-5), ("bf16", 3e-2)])
def test_forward_matches_dense_oracle(mode, tol):
    rng = np.random.default_rng(0)
    n_out, n_in, nnz, F = 500, 900, 4000, 6
    rows, cols, vals = _random_stream(rng, n_out, n_in, nnz)
    op = make_flat_operator(rows, cols, vals, n_in=n_in, n_out=n_out, block=64, mode=mode)
    Y = rng.standard_normal((n_in, F)).astype(np.float32)
    Z = np.asarray(op(jnp.asarray(Y)))
    Z_oracle = _dense(rows, cols, vals, n_out, n_in) @ Y
    scale = np.abs(Z_oracle).max() + 1e-30
    assert Z.shape == (n_out, F)
    assert np.abs(Z - Z_oracle).max() / scale < tol


def test_duplicate_entries_accumulate():
    rows = np.array([3, 3, 3, 7])
    cols = np.array([5, 5, 2, 5])
    vals = np.array([1.0, 2.0, 4.0, 8.0], np.float32)
    op = make_flat_operator(rows, cols, vals, n_in=10, n_out=10, block=8)
    Y = np.zeros((10, 2), np.float32)
    Y[5] = 1.0
    Z = np.asarray(op(jnp.asarray(Y)))
    assert Z[3, 0] == pytest.approx(3.0)
    assert Z[7, 0] == pytest.approx(8.0)


def test_empty_stream():
    op = make_flat_operator(
        np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.float32),
        n_in=17, n_out=9,
    )
    Z = op(jnp.ones((17, 3), jnp.float32))
    assert Z.shape == (9, 3)
    assert float(jnp.abs(Z).max()) == 0.0


def test_grad_matches_transpose_oracle():
    rng = np.random.default_rng(1)
    n_out, n_in, nnz, F = 300, 400, 2500, 4
    rows, cols, vals = _random_stream(rng, n_out, n_in, nnz)
    op = make_flat_operator(rows, cols, vals, n_in=n_in, n_out=n_out, block=64)
    Y = jnp.asarray(rng.standard_normal((n_in, F)).astype(np.float32))
    W = rng.standard_normal((n_out, F)).astype(np.float32)

    def loss(Y):
        return jnp.sum(op(Y) * jnp.asarray(W))

    g = np.asarray(jax.grad(loss)(Y))
    D = _dense(rows, cols, vals, n_out, n_in)
    g_oracle = D.T @ W
    scale = np.abs(g_oracle).max() + 1e-30
    assert np.abs(g - g_oracle).max() / scale < 1e-5


def test_is_a_pytree_through_jit():
    rng = np.random.default_rng(2)
    rows, cols, vals = _random_stream(rng, 100, 100, 500)
    op = make_flat_operator(rows, cols, vals, n_in=100, n_out=100, block=32)
    Y = jnp.asarray(rng.standard_normal((100, 3)).astype(np.float32))

    @jax.jit
    def f(op: BlockDenseOperator, Y):
        return op(Y).sum()

    assert np.isfinite(float(f(op, Y)))


def test_max_bytes_guard_and_estimate():
    rng = np.random.default_rng(3)
    # Scattered pattern: every nonzero its own block — hostile.
    rows, cols, vals = _random_stream(rng, 50_000, 50_000, 3000, clustered=False)
    est = estimate(rows, cols, block=128)
    assert est["n_blocks"] > 2000  # nearly one block per nonzero
    with pytest.raises(ValueError):
        make_flat_operator(
            rows, cols, vals, n_in=50_000, n_out=50_000, max_bytes=10_000_000
        )


def test_nested_incidence_matches_dense():
    """Tiny dense_limit forces the nested-operator incidence path."""
    rng = np.random.default_rng(5)
    n_out, n_in, nnz, F = 800, 700, 5000, 3
    rows, cols, vals = _random_stream(rng, n_out, n_in, nnz)
    Y = jnp.asarray(rng.standard_normal((n_in, F)).astype(np.float32))
    op_dense = make_flat_operator(rows, cols, vals, n_in=n_in, n_out=n_out, block=64)
    op_nested = make_flat_operator(
        rows, cols, vals, n_in=n_in, n_out=n_out, block=64, dense_limit=16
    )
    assert isinstance(op_nested.oh_rw, BlockDenseOperator)
    assert isinstance(op_nested.oh_cw, BlockDenseOperator)
    np.testing.assert_allclose(
        np.asarray(op_nested(Y)), np.asarray(op_dense(Y)), rtol=1e-5, atol=1e-5
    )
    # gradients flow through the nested matmuls natively
    g_d = jax.grad(lambda Y: (op_dense(Y) ** 2).sum())(Y)
    g_n = jax.grad(lambda Y: (op_nested(Y) ** 2).sum())(Y)
    np.testing.assert_allclose(np.asarray(g_n), np.asarray(g_d), rtol=1e-4, atol=1e-4)


def test_temporal_operator_matches_spmm():
    from tmgcn_tpu.core.sparse import TemporalCOO
    from tmgcn_tpu.ops.spmm import spmm
    from tmgcn_tpu.ops.spmm_blockdense import make_operator

    rng = np.random.default_rng(6)
    T, N, per, F = 4, 200, 400, 5
    rows = np.sort(rng.integers(0, N, (T, per)), axis=1).astype(np.int32)
    cols = rng.integers(0, N, (T, per)).astype(np.int32)
    vals = rng.standard_normal((T, per)).astype(np.float32)
    A = TemporalCOO(rows=rows, cols=cols, vals=vals,
                    nnz=np.full(T, per, np.int32), n_nodes=N)
    X = jnp.asarray(rng.standard_normal((T, N, F)).astype(np.float32))
    Z_ref = np.asarray(spmm(A, X, impl="jnp"))
    for mode, tol in (("exact", 1e-5), ("bf16", 3e-2)):
        op = make_operator(A, block=64, mode=mode)
        assert op.n_slices == T and op.n_nodes == N
        Z = np.asarray(op(X))
        scale = np.abs(Z_ref).max() + 1e-30
        assert np.abs(Z - Z_ref).max() / scale < tol
    # dispatch through ops.spmm on the operator and via impl string
    op = make_operator(A, block=64)
    np.testing.assert_allclose(np.asarray(spmm(op, X)), Z_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(spmm(A, X, impl="blockdense")), Z_ref, rtol=1e-5, atol=1e-5
    )


def test_restricted_builder_blockdense_matches_rowsplit():
    """The adapter's restricted layer-2 op: blockdense == rowsplit."""
    from tmgcn_tpu.core.sparse import TemporalCOO
    from tmgcn_tpu.tasks.adapters import _build_restricted_layer2

    rng = np.random.default_rng(4)
    T, N, per, E = 5, 120, 300, 80
    rows = np.sort(rng.integers(0, N, (T, per)), axis=1).astype(np.int32)
    cols = rng.integers(0, N, (T, per)).astype(np.int32)
    vals = rng.standard_normal((T, per)).astype(np.float32)
    A = TemporalCOO(
        rows=rows, cols=cols, vals=vals,
        nnz=np.full(T, per, np.int32), n_nodes=N,
    )
    edges = np.stack([
        rng.integers(0, T, E), rng.integers(0, N, E), rng.integers(0, N, E)
    ]).astype(np.int64)
    F0 = 3
    cached = jnp.asarray(rng.standard_normal((T, N, F0)).astype(np.float32))

    bundles = {}
    for operator in ("rowsplit", "blockdense"):
        bundle = {"cached": cached}
        _build_restricted_layer2(bundle, A, edges, False, operator=operator)
        bundles[operator] = bundle
    n_used = bundles["rowsplit"]["l2_Hin"].shape[0]
    assert bundles["blockdense"]["l2_Hin"].shape[0] == n_used
    Y = jnp.asarray(rng.standard_normal((n_used, F0)).astype(np.float32))
    outs = {k: np.asarray(b["l2op"](Y)) for k, b in bundles.items()}
    np.testing.assert_allclose(
        outs["blockdense"], outs["rowsplit"], rtol=2e-5, atol=2e-5
    )
    for b in bundles.values():
        assert np.asarray(b["l2_src"]).shape == (E,)
        assert np.asarray(b["l2_trg"]).shape == (E,)


def test_auto_operator_selection():
    """make_auto_operator: unpacked off-TPU; auto impl strings accepted
    end-to-end by the restricted builder (-> rowsplit on CPU)."""
    import jax

    from tmgcn_tpu.core.sparse import TemporalCOO
    from tmgcn_tpu.ops.spmm import make_auto_operator, spmm
    from tmgcn_tpu.tasks.adapters import OPERATOR_IMPLS, _build_restricted_layer2

    assert "auto" in OPERATOR_IMPLS and "auto_bf16" in OPERATOR_IMPLS

    rng = np.random.default_rng(11)
    T, N, per, E = 3, 100, 200, 50
    rows = np.sort(rng.integers(0, N, (T, per)), axis=1).astype(np.int32)
    cols = rng.integers(0, N, (T, per)).astype(np.int32)
    vals = rng.standard_normal((T, per)).astype(np.float32)
    A = TemporalCOO(rows=rows, cols=cols, vals=vals,
                    nnz=np.full(T, per, np.int32), n_nodes=N)
    assert jax.default_backend() != "tpu"  # conftest pins CPU
    op = make_auto_operator(A)
    assert op is A  # CPU: native XLA gather/segment path, no prepack
    X = jnp.asarray(rng.standard_normal((T, N, 4)).astype(np.float32))
    Z_jnp = np.asarray(spmm(A, X, impl="jnp"))

    edges = np.stack([
        rng.integers(0, T, E), rng.integers(0, N, E), rng.integers(0, N, E)
    ]).astype(np.int64)
    cached = jnp.asarray(rng.standard_normal((T, N, 3)).astype(np.float32))
    outs = {}
    for operator in ("rowsplit", "auto", "auto_bf16"):
        bundle = {"cached": cached}
        _build_restricted_layer2(bundle, A, edges, False, operator=operator)
        n_used = bundle["l2_Hin"].shape[0]
        Y = jnp.asarray(
            np.random.default_rng(0).standard_normal((n_used, 3)).astype(np.float32)
        )
        outs[operator] = np.asarray(bundle["l2op"](Y))
    np.testing.assert_allclose(outs["auto"], outs["rowsplit"], rtol=1e-6)
    np.testing.assert_allclose(outs["auto_bf16"], outs["rowsplit"], rtol=1e-6)
    del Z_jnp
