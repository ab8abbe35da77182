"""Sharded execution on the virtual 8-device CPU mesh vs single-device oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tmgcn_tpu.core.mmatrix import make_m_matrix
from tmgcn_tpu.core.sparse import TemporalCOO
from tmgcn_tpu.ops.mtransform import m_transform
from tmgcn_tpu.ops.spmm import spmm
from tmgcn_tpu.ops.edge_readout import edge_readout
from tmgcn_tpu.parallel.mesh import make_mesh
from tmgcn_tpu.parallel.partition import partition_rows, pad_time
from tmgcn_tpu.parallel.tmgcn_sharded import (
    make_sharded_forward,
    make_sharded_train_step,
    shard_batch,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _setup(rng, T=8, N=64, F=4, E=100, n_graph=4, n_time=2):
    dense = (rng.random((T, N, N)) < 0.05) * rng.random((T, N, N))
    A = TemporalCOO.from_dense(dense, dtype=jnp.float32, pad_multiple=16)
    M = make_m_matrix(T, 3).astype(np.float32)
    X = rng.standard_normal((T, N, F)).astype(np.float32)
    edges = np.stack(
        [rng.integers(0, T, E), rng.integers(0, N, E), rng.integers(0, N, E)]
    ).astype(np.int32)
    mesh = make_mesh(n_graph=n_graph, n_time=n_time)
    A_sh = pad_time(partition_rows(A, n_graph, pad_multiple=16), n_time)
    return dense, A, A_sh, M, X, edges, mesh


class TestPartition:
    def test_roundtrip_sums(self):
        rng = np.random.default_rng(0)
        dense, A, A_sh, *_ = _setup(rng)
        assert A_sh.rows.shape[1] == 4
        # Total values preserved.
        np.testing.assert_allclose(
            np.asarray(A_sh.vals).sum(), np.asarray(A.vals).sum(), rtol=1e-6
        )
        # Every entry's global row = local row + shard * n_local.
        g = 1
        k = 2
        n = int(A_sh.nnz[k, g])
        global_rows = np.asarray(A_sh.rows[k, g, :n]) + g * A_sh.n_local_rows
        assert np.all(global_rows >= g * A_sh.n_local_rows)
        assert np.all(global_rows < (g + 1) * A_sh.n_local_rows)


class TestShardedForward:
    def test_matches_single_device(self):
        rng = np.random.default_rng(1)
        dense, A, A_sh, M, X, edges, mesh = _setup(rng)
        fwd = make_sharded_forward(mesh, A_sh.n_local_rows)
        params = {
            "W": jnp.asarray(rng.standard_normal((4, 6)).astype(np.float32)),
            "U": jnp.asarray(rng.standard_normal((12, 2)).astype(np.float32)),
        }
        batch = shard_batch(mesh, A_sh, jnp.asarray(X), jnp.asarray(M), jnp.asarray(edges), None)
        out = fwd(params, batch["A"], batch["X"], batch["M"], batch["edges"])

        # Single-device oracle (n_pad == N here since N % n_graph == 0).
        Xt = m_transform(jnp.asarray(M), jnp.asarray(X))
        Y = spmm(jax.device_put(A), Xt) @ params["W"]
        ref = edge_readout(Y, jnp.asarray(edges), params["U"])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_grad_matches(self):
        rng = np.random.default_rng(2)
        dense, A, A_sh, M, X, edges, mesh = _setup(rng)
        fwd = make_sharded_forward(mesh, A_sh.n_local_rows)
        params = {
            "W": jnp.asarray(rng.standard_normal((4, 6)).astype(np.float32)),
            "U": jnp.asarray(rng.standard_normal((12, 2)).astype(np.float32)),
        }
        batch = shard_batch(mesh, A_sh, jnp.asarray(X), jnp.asarray(M), jnp.asarray(edges), None)

        def loss_sharded(p):
            return jnp.sum(fwd(p, batch["A"], batch["X"], batch["M"], batch["edges"]) ** 2)

        def loss_ref(p):
            Xt = m_transform(jnp.asarray(M), jnp.asarray(X))
            Y = spmm(jax.device_put(A), Xt) @ p["W"]
            return jnp.sum(edge_readout(Y, jnp.asarray(edges), p["U"]) ** 2)

        g1 = jax.grad(loss_sharded)(params)
        g2 = jax.grad(loss_ref)(params)
        np.testing.assert_allclose(np.asarray(g1["W"]), np.asarray(g2["W"]), rtol=2e-3, atol=1e-2)
        np.testing.assert_allclose(np.asarray(g1["U"]), np.asarray(g2["U"]), rtol=2e-3, atol=1e-2)


class TestShardedTrainStep:
    def test_runs_and_descends(self):
        rng = np.random.default_rng(3)
        dense, A, A_sh, M, X, edges, mesh = _setup(rng)
        opt = optax.sgd(1e-4, momentum=0.9)
        step = make_sharded_train_step(mesh, A_sh.n_local_rows, opt)
        params = {
            "W": jnp.asarray(rng.standard_normal((4, 6)).astype(np.float32)),
            "U": jnp.asarray(rng.standard_normal((12, 2)).astype(np.float32)),
        }
        opt_state = opt.init(params)
        targets = jnp.asarray(rng.integers(0, 2, edges.shape[1]).astype(np.int32))
        cw = jnp.asarray(np.array([0.9, 0.1], dtype=np.float32))
        batch = shard_batch(mesh, A_sh, jnp.asarray(X), jnp.asarray(M), jnp.asarray(edges), targets)
        losses = []
        for _ in range(5):
            params, opt_state, loss = step(
                params, opt_state, batch["A"], batch["X"], batch["M"],
                batch["edges"], targets, cw,
            )
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]
