"""Preprocessing pipeline vs small dense oracles + chess end-to-end."""

from pathlib import Path

import numpy as np
import pytest

from tmgcn_tpu.core.sparse import TemporalCOO
from tmgcn_tpu.preprocess.datasets import REGISTRY, load_raw
from tmgcn_tpu.preprocess.matio import load_artifact, save_artifact
from tmgcn_tpu.preprocess.pipeline import (
    PreprocessConfig,
    RawEdges,
    apply_edge_life,
    bin_edges,
    build_tensors,
    filter_nodes_by_column_sum,
    normalize_laplacian,
    preprocess,
    symmetrize,
)

DATA_DIR = Path(__file__).resolve().parent.parent / "data" / "chess"


class TestBinning:
    def test_fixed_delta(self):
        ts = np.array([0.0, 5.0, 10.0, 15.0, 25.0, 34.0])
        raw = bin_edges(
            np.ones(6), np.full(6, 2), np.ones(6), ts, time_delta=10.0,
            one_based_nodes=True,
        )
        # floor((34-0)/10) = 3 slices; edges at t>=30 dropped.
        assert raw.n_slices == 3
        np.testing.assert_array_equal(raw.slice_id, [0, 0, 1, 1, 2])

    def test_unique_timestamps(self):
        ts = np.array([7.0, 3.0, 7.0, 9.0])
        raw = bin_edges(
            np.ones(4), np.full(4, 2), np.ones(4), ts, time_delta=None,
            one_based_nodes=True,
        )
        assert raw.n_slices == 3
        np.testing.assert_array_equal(raw.slice_id, [1, 0, 1, 2])


def _random_raw(rng, T=4, N=12, E=60):
    return RawEdges(
        src=rng.integers(0, N, E),
        dst=rng.integers(0, N, E),
        weight=rng.standard_normal(E),
        slice_id=rng.integers(0, T, E),
        n_nodes=N,
        n_slices=T,
    )


class TestStages:
    def test_symmetrize(self):
        rng = np.random.default_rng(0)
        raw = _random_raw(rng)
        A, _ = build_tensors(raw, pad_multiple=16)
        dense = np.asarray(A.to_dense())
        B = symmetrize(A, pad_multiple=16)
        np.testing.assert_allclose(
            np.asarray(B.to_dense()), (dense + dense.transpose(0, 2, 1)) / 2, atol=1e-12
        )

    def test_edge_life(self):
        rng = np.random.default_rng(1)
        raw = _random_raw(rng)
        A, _ = build_tensors(raw, pad_multiple=16)
        dense = np.asarray(A.to_dense())
        w = 2
        B = apply_edge_life(A, w, pad_multiple=16)
        ref = np.stack(
            [dense[max(0, t - w + 1) : t + 1].sum(axis=0) for t in range(raw.n_slices)]
        )
        np.testing.assert_allclose(np.asarray(B.to_dense()), ref, atol=1e-12)

    def test_normalize(self):
        rng = np.random.default_rng(2)
        raw = _random_raw(rng)
        A, _ = build_tensors(raw, pad_multiple=16)
        dense = np.abs(np.asarray(A.to_dense()))
        A = TemporalCOO.from_dense(dense, pad_multiple=16)
        C = normalize_laplacian(A, pad_multiple=16)
        ref = np.zeros_like(dense)
        for k in range(raw.n_slices):
            c = dense[k] + np.eye(raw.n_nodes)
            d = 1.0 / np.sqrt(c.sum(axis=1))
            ref[k] = d[:, None] * c * d[None, :]
        np.testing.assert_allclose(np.asarray(C.to_dense()), ref, atol=1e-12)

    def test_node_filter(self):
        raw = RawEdges(
            src=np.array([0, 1, 2, 2]),
            dst=np.array([1, 2, 0, 1]),
            weight=np.array([5.0, 1.0, 5.0, 5.0]),
            slice_id=np.zeros(4, dtype=np.int64),
            n_nodes=3,
            n_slices=1,
        )
        # column sums: node0=5, node1=10, node2=1 -> drop node 2.
        f = filter_nodes_by_column_sum(raw, 2.0)
        assert f.n_nodes == 2
        np.testing.assert_array_equal(f.src, [0])
        np.testing.assert_array_equal(f.dst, [1])


class TestFullPipeline:
    def test_small_synthetic(self):
        rng = np.random.default_rng(3)
        raw = _random_raw(rng, T=8, N=15, E=100)
        cfg = PreprocessConfig(
            4, 2, 2, time_delta=1.0, edge_life_window=3, n_diagonals=3, pad_multiple=16
        )
        data = preprocess(raw, cfg)
        assert data.C.n_slices == 8
        for w in ("train", "val", "test"):
            assert data.C_windows[w].n_slices == 4
            assert data.Ct_windows[w].n_slices == 4
        # Ct_train[0] = M[0,0] * C[0].
        ct0 = np.asarray(data.Ct_windows["train"].to_dense())[0]
        c0 = np.asarray(data.C_windows["train"].to_dense())[0]
        np.testing.assert_allclose(ct0, data.M[0, 0] * c0, atol=1e-12)

    def test_matio_roundtrip(self, tmp_path):
        rng = np.random.default_rng(4)
        raw = _random_raw(rng, T=8, N=15, E=100)
        cfg = PreprocessConfig(
            4, 2, 2, time_delta=1.0, edge_life_window=3, n_diagonals=3, pad_multiple=16
        )
        data = preprocess(raw, cfg)
        path = tmp_path / "artifact.mat"
        save_artifact(path, data)
        loaded = load_artifact(path, s_train=4, pad_multiple=16)
        np.testing.assert_allclose(loaded["M"], data.M, atol=1e-12)
        for w in ("train", "val", "test"):
            np.testing.assert_allclose(
                np.asarray(loaded["Ct"][w].to_dense()),
                np.asarray(data.Ct_windows[w].to_dense()),
                atol=1e-12,
            )
        np.testing.assert_allclose(
            np.asarray(loaded["A_labels"].to_dense()),
            np.asarray(data.A_labels.to_dense()),
            atol=1e-12,
        )


@pytest.mark.skipif(not DATA_DIR.exists(), reason="chess data not present")
class TestChess:
    def test_load_and_bin(self):
        raw = load_raw(REGISTRY["chess"], DATA_DIR)
        assert raw.n_slices == 100  # unique months in the KONECT chess data
        assert raw.n_nodes == 7301
        assert len(raw.src) == 65053

    def test_preprocess_window_shapes(self):
        spec = REGISTRY["chess"]
        raw = load_raw(spec, DATA_DIR)
        data = preprocess(raw, spec.preprocess)
        assert data.C.n_slices == 100
        for w in ("train", "val", "test"):
            assert data.Ct_windows[w].n_slices == 80
        # Normalized rows of C are bounded by 1 (D^{-1/2}(B+I)D^{-1/2}).
        vals = np.asarray(data.C.vals)
        assert np.nanmax(vals) <= 1.0 + 1e-9
