"""Unit tests for core containers and ops vs dense numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmgcn_tpu.core.mmatrix import band_offsets, make_m_dct, make_m_matrix
from tmgcn_tpu.core.sparse import TemporalCOO
from tmgcn_tpu.ops.degree import degree_features
from tmgcn_tpu.ops.edge_readout import edge_embeddings, edge_readout
from tmgcn_tpu.ops.mtransform import m_transform, m_transform_coo, m_transform_inverse
from tmgcn_tpu.ops.spmm import spmm, spmm_dense_reference


def random_temporal(rng, T=5, N=40, density=0.05, dtype=jnp.float64):
    dense = (rng.random((T, N, N)) < density) * rng.standard_normal((T, N, N))
    return TemporalCOO.from_dense(dense, dtype=dtype, pad_multiple=16), dense


class TestTemporalCOO:
    def test_roundtrip_dense(self):
        rng = np.random.default_rng(0)
        A, dense = random_temporal(rng)
        np.testing.assert_allclose(np.asarray(A.to_dense()), dense, atol=1e-12)

    def test_coalesce_sums_duplicates(self):
        A = TemporalCOO.from_slices(
            [(np.array([1, 1, 0]), np.array([2, 2, 0]), np.array([1.0, 2.0, 5.0]))],
            n_nodes=4,
            dtype=jnp.float64,
            pad_multiple=8,
        )
        d = np.asarray(A.to_dense())[0]
        assert d[1, 2] == 3.0 and d[0, 0] == 5.0
        assert int(A.nnz[0]) == 2

    def test_rows_sorted(self):
        rng = np.random.default_rng(1)
        A, _ = random_temporal(rng)
        rows = np.asarray(A.rows)
        for k in range(A.n_slices):
            n = int(A.nnz[k])
            assert np.all(np.diff(rows[k, :n]) >= 0)

    def test_transpose(self):
        rng = np.random.default_rng(2)
        A, dense = random_temporal(rng)
        At = A.transpose()
        np.testing.assert_allclose(
            np.asarray(At.to_dense()), dense.transpose(0, 2, 1), atol=1e-12
        )

    def test_slice_window(self):
        rng = np.random.default_rng(3)
        A, dense = random_temporal(rng)
        W = A.slice_window(1, 4)
        np.testing.assert_allclose(np.asarray(W.to_dense()), dense[1:4], atol=1e-12)


class TestMMatrix:
    def test_matlab_convention(self):
        M = make_m_matrix(6, n_diagonals=3, weight="inverse")
        assert M[0, 0] == 1.0 and M[2, 0] == pytest.approx(1 / 3)
        assert M[3, 0] == 0.0
        assert np.allclose(M, np.tril(M))

    def test_rownorm_convention(self):
        M = make_m_matrix(6, n_diagonals=3, weight="ones", row_normalize=True)
        np.testing.assert_allclose(M.sum(axis=1), 1.0)
        assert M[0, 0] == 1.0 and M[2, 0] == pytest.approx(1 / 3)

    def test_band_offsets(self):
        M = make_m_matrix(10, n_diagonals=4)
        assert band_offsets(M) == (3, 0)

    def test_dct_orthonormal(self):
        M = make_m_dct(8)
        np.testing.assert_allclose(M @ M.T, np.eye(8), atol=1e-12)


class TestSpmm:
    def test_matches_dense(self):
        rng = np.random.default_rng(4)
        A, dense = random_temporal(rng)
        X = jnp.asarray(rng.standard_normal((5, 40, 7)))
        out = spmm(A, X)
        ref = spmm_dense_reference(jnp.asarray(dense), X)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-10)

    def test_grad_is_transpose(self):
        rng = np.random.default_rng(5)
        A, dense = random_temporal(rng, T=3, N=20)
        X = jnp.asarray(rng.standard_normal((3, 20, 4)))
        G = jnp.asarray(rng.standard_normal((3, 20, 4)))
        dX = jax.grad(lambda x: jnp.vdot(spmm(A, x), G))(X)
        ref = jnp.einsum("tij,tif->tjf", jnp.asarray(dense), G)
        np.testing.assert_allclose(np.asarray(dX), np.asarray(ref), atol=1e-10)

    def test_jit_stable(self):
        rng = np.random.default_rng(6)
        A, dense = random_temporal(rng, T=2, N=16)
        X = jnp.asarray(rng.standard_normal((2, 16, 3)))
        out = jax.jit(spmm, static_argnames="impl")(A, X)
        ref = spmm_dense_reference(jnp.asarray(dense), X)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-10)


class TestMTransform:
    def test_dense(self):
        rng = np.random.default_rng(7)
        M = jnp.asarray(make_m_matrix(6, 3))
        X = jnp.asarray(rng.standard_normal((6, 10, 4)))
        out = m_transform(M, X)
        ref = np.einsum("st,tnf->snf", np.asarray(M), np.asarray(X))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-12)

    def test_inverse_roundtrip(self):
        rng = np.random.default_rng(8)
        M = jnp.asarray(make_m_matrix(6, 3))
        X = jnp.asarray(rng.standard_normal((6, 10, 4)))
        np.testing.assert_allclose(
            np.asarray(m_transform_inverse(M, m_transform(M, X))),
            np.asarray(X),
            atol=1e-10,
        )

    def test_coo_matches_dense(self):
        rng = np.random.default_rng(9)
        A, dense = random_temporal(rng, T=6, N=25)
        M = make_m_matrix(6, 3)
        Ct = m_transform_coo(A, M, pad_multiple=16)
        ref = np.einsum("st,tij->sij", M, dense)
        np.testing.assert_allclose(np.asarray(Ct.to_dense()), ref, atol=1e-12)


class TestEdgeReadout:
    def test_matches_concat(self):
        rng = np.random.default_rng(10)
        T, N, F, C, E = 4, 12, 5, 3, 20
        Y = jnp.asarray(rng.standard_normal((T, N, F)))
        edges = jnp.asarray(
            np.stack(
                [
                    rng.integers(0, T, E),
                    rng.integers(0, N, E),
                    rng.integers(0, N, E),
                ]
            )
        )
        U = jnp.asarray(rng.standard_normal((2 * F, C)))
        out = edge_readout(Y, edges, U)
        ref = edge_embeddings(Y, edges) @ U
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-12)


class TestDegree:
    def test_matches_dense_sums(self):
        rng = np.random.default_rng(11)
        A, dense = random_temporal(rng)
        feats = degree_features(A, dtype=jnp.float64)
        np.testing.assert_allclose(np.asarray(feats[..., 0]), dense.sum(axis=1), atol=1e-10)
        np.testing.assert_allclose(np.asarray(feats[..., 1]), dense.sum(axis=2), atol=1e-10)
