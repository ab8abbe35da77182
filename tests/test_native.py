"""Native (C++) host runtime vs Python fallbacks."""

from pathlib import Path

import numpy as np
import pytest

from tmgcn_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built / no toolchain"
)

DATA = Path(__file__).resolve().parent.parent / "data" / "chess" / "out.chess.csv"


class TestSampleNegatives:
    def test_no_collisions_and_deterministic(self):
        rng = np.random.default_rng(0)
        N = 200
        real = np.unique(rng.integers(0, N * N, 500))
        s1, d1 = native.sample_negatives(real, N, 1000, seed=7)
        s2, d2 = native.sample_negatives(real, N, 1000, seed=7)
        np.testing.assert_array_equal(s1, s2)
        np.testing.assert_array_equal(d1, d2)
        keys = s1.astype(np.int64) * N + d1
        assert not np.isin(keys, real).any()
        assert s1.min() >= 0 and s1.max() < N

    def test_through_augment_edges(self):
        from tmgcn_tpu.tasks.sampling import augment_edges

        rng = np.random.default_rng(1)
        E, N = 80, 60
        edges = np.stack(
            [rng.integers(0, 3, E), rng.integers(0, N, E), rng.integers(0, N, E)]
        )
        aug, labels = augment_edges(edges, N, 2, 2, 2, seed=3)
        assert np.sum(labels == 0) == E
        for j in range(3):
            n_real = np.sum(edges[0] == j)
            assert np.sum(aug[0] == j) == 3 * n_real


class TestPackChunks:
    def test_matches_python_packer(self, monkeypatch):
        import jax.numpy as jnp

        from tmgcn_tpu.core.sparse import TemporalCOO
        from tmgcn_tpu.kernels import spmm_pallas

        rng = np.random.default_rng(2)
        dense = (rng.random((3, 50, 50)) < 0.1) * rng.random((3, 50, 50))
        A = TemporalCOO.from_dense(dense, dtype=jnp.float32, pad_multiple=16)

        packed_native = spmm_pallas.pack_windowed(A, chunk=32, window=32)
        # Force the pure-Python path by hiding the native module.
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_load_failed", True)
        packed_py = spmm_pallas.pack_windowed(A, chunk=32, window=32)

        np.testing.assert_array_equal(
            np.asarray(packed_native.rows), np.asarray(packed_py.rows)
        )
        np.testing.assert_array_equal(
            np.asarray(packed_native.cols), np.asarray(packed_py.cols)
        )
        np.testing.assert_allclose(
            np.asarray(packed_native.vals), np.asarray(packed_py.vals), rtol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(packed_native.window_id), np.asarray(packed_py.window_id)
        )
        np.testing.assert_array_equal(
            np.asarray(packed_native.is_first), np.asarray(packed_py.is_first)
        )


@pytest.mark.skipif(not DATA.exists(), reason="chess data not present")
class TestParse:
    def test_matches_loadtxt(self):
        ours = native.parse_edges(DATA, [0, 1, 2, 3], None, 1, "%")
        ref = np.loadtxt(DATA, skiprows=1, comments="%")
        np.testing.assert_allclose(ours, ref[:, :4])
