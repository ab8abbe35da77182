"""Banded halo-exchange time sharding vs dense/single-device oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tmgcn_tpu.core.mmatrix import band_offsets, make_m_matrix
from tmgcn_tpu.core.sparse import TemporalCOO
from tmgcn_tpu.ops.mtransform import m_transform
from tmgcn_tpu.parallel.halo import banded_m_transform_local, local_banded_m
from tmgcn_tpu.parallel.mesh import TIME_AXIS, make_mesh
from tmgcn_tpu.parallel.partition import partition_rows
from tmgcn_tpu.parallel.tmgcn_sharded import (
    make_sharded_train_step_halo,
    partition_edges_by_time,
    shard_batch,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


class TestLocalBandedM:
    def test_blocks_reconstruct(self):
        T, n_time = 8, 2
        M = make_m_matrix(T, 3)
        halo = band_offsets(M)[0]
        blocks = local_banded_m(M, n_time, halo)
        assert blocks.shape == (n_time, 4, 4 + halo)
        # Shard 1's block row 0 must reproduce M row 4 over cols [4-halo, 8).
        np.testing.assert_allclose(blocks[1][0], M[4, 4 - halo : 8])

    def test_multihop_blocks_reconstruct(self):
        """Band wider than a shard window: blocks still tile M."""
        T, n_time = 8, 4
        M = make_m_matrix(T, 6)
        halo = band_offsets(M)[0]
        assert halo > T // n_time  # the multi-hop regime
        blocks = local_banded_m(M, n_time, halo)
        T_loc = T // n_time
        for i in range(n_time):
            t0 = i * T_loc
            lo = t0 - halo
            want = np.zeros((T_loc, T_loc + halo))
            src_lo = max(0, lo)
            want[:, src_lo - lo : T_loc + halo] = M[t0 : t0 + T_loc, src_lo : t0 + T_loc]
            np.testing.assert_allclose(blocks[i], want)


class TestShardedBandedTransform:
    @pytest.mark.parametrize(
        "T,band,n_time",
        [
            (8, 3, 4),   # single-hop: halo <= T_loc
            (8, 6, 4),   # multi-hop: halo (5) > T_loc (2)
            (80, 20, 8), # the canonical config: T_loc=10, halo=19 -> 2 hops
        ],
    )
    def test_matches_dense(self, T, band, n_time):
        rng = np.random.default_rng(0)
        N, F = 16, 4
        M = make_m_matrix(T, band).astype(np.float32)
        halo = band_offsets(M)[0]
        X = rng.standard_normal((T, N, F)).astype(np.float32)
        blocks = jnp.asarray(local_banded_m(M, n_time, halo), jnp.float32)
        mesh = make_mesh(n_graph=8 // n_time, n_time=n_time)

        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        f = shard_map(
            lambda x, mb: banded_m_transform_local(x, mb[0], halo),
            mesh=mesh,
            in_specs=(P(TIME_AXIS, None, None), P(TIME_AXIS, None, None)),
            out_specs=P(TIME_AXIS, None, None),
            check_vma=False,
        )
        out = f(jnp.asarray(X), blocks)
        ref = m_transform(jnp.asarray(M), jnp.asarray(X))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


class TestEdgePartition:
    def test_buckets(self):
        edges = np.stack([np.array([0, 1, 3, 3, 7]), np.arange(5), np.arange(5)])
        targets = np.array([0, 1, 0, 1, 0])
        e, t, m = partition_edges_by_time(edges, targets, 8, 2, pad_multiple=4)
        assert e.shape == (2, 3, 4)
        np.testing.assert_array_equal(e[0, 0, :4], [0, 1, 3, 3])
        np.testing.assert_array_equal(e[1, 0, :1], [3])  # slice 7 -> local 3
        assert m[0].sum() == 4 and m[1].sum() == 1


class TestHaloTrainStep:
    def test_descends_and_matches_reference_loss(self):
        rng = np.random.default_rng(1)
        T, N, F, E = 8, 64, 4, 120
        n_graph, n_time = 4, 2
        dense = (rng.random((T, N, N)) < 0.05) * rng.random((T, N, N))
        A = TemporalCOO.from_dense(dense, dtype=jnp.float32, pad_multiple=16)
        M = make_m_matrix(T, 3).astype(np.float32)
        halo = band_offsets(M)[0]
        X = rng.standard_normal((T, N, F)).astype(np.float32)
        edges = np.stack(
            [rng.integers(0, T, E), rng.integers(0, N, E), rng.integers(0, N, E)]
        ).astype(np.int32)
        targets = rng.integers(0, 2, E).astype(np.int32)
        cw = np.array([0.9, 0.1], dtype=np.float32)

        mesh = make_mesh(n_graph=n_graph, n_time=n_time)
        A_sh = partition_rows(A, n_graph, pad_multiple=16)
        m_blocks = local_banded_m(M, n_time, halo)
        e_sh, t_sh, m_sh = partition_edges_by_time(edges, targets, T, n_time, 16)

        opt = optax.sgd(1e-4, momentum=0.9)
        step = make_sharded_train_step_halo(mesh, A_sh.n_local_rows, opt, m_blocks, halo)
        params = {
            "W": jnp.asarray(rng.standard_normal((F, 6)).astype(np.float32)),
            "U": jnp.asarray(rng.standard_normal((12, 2)).astype(np.float32)),
        }
        params0 = jax.tree.map(lambda x: x.copy(), params)
        opt_state = opt.init(params)
        batch = shard_batch(mesh, A_sh, jnp.asarray(X), jnp.asarray(M), jnp.asarray(edges), None)

        losses = []
        for _ in range(5):
            params, opt_state, loss = step(
                params, opt_state, batch["A"], batch["X"],
                jnp.asarray(e_sh), jnp.asarray(t_sh), jnp.asarray(m_sh), jnp.asarray(cw),
            )
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]

        # First-step loss equals the unsharded reference loss.
        from tmgcn_tpu.models.tmgcn import TMGCN
        from tmgcn_tpu.train.losses import weighted_cross_entropy

        model = TMGCN(n_slices=T, in_feat=F, hidden_feat=(6, 2))
        out = model.apply(
            {"params": params0, "buffers": {}},
            A, jnp.asarray(X), jnp.asarray(edges), jnp.asarray(M),
        )
        ref_loss = float(
            weighted_cross_entropy(out, jnp.asarray(targets), jnp.asarray(cw))
        )
        assert losses[0] == pytest.approx(ref_loss, rel=1e-4)
