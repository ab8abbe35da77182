"""Sharded ModelAdapter vs the single-device path (8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmgcn_tpu.core.mmatrix import make_m_matrix
from tmgcn_tpu.core.sparse import TemporalCOO
from tmgcn_tpu.models.tmgcn import TMGCN, TMGCN2
from tmgcn_tpu.parallel.adapter import bucket_edges_by_time, make_sharded_edge_adapter
from tmgcn_tpu.parallel.mesh import make_mesh
from tmgcn_tpu.tasks.adapters import make_edge_adapter

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    T, N, F, E = 8, 48, 4, 200
    dense = (rng.random((T, N, N)) < 0.06) * rng.random((T, N, N))
    A = TemporalCOO.from_dense(dense, dtype=jnp.float32, pad_multiple=16)
    M = make_m_matrix(T, 3).astype(np.float32)
    X = rng.standard_normal((T, N, F)).astype(np.float32)
    edges = np.stack(
        [rng.integers(0, T, E), rng.integers(0, N, E), rng.integers(0, N, E)]
    ).astype(np.int64)
    adj = {w: A for w in ("train", "val", "test")}
    feats = {w: X for w in ("train", "val", "test")}
    edict = {w: edges for w in ("train", "val", "test")}
    return A, M, X, edges, adj, feats, edict


class TestBucketing:
    def test_roundtrip_order(self):
        rng = np.random.default_rng(1)
        edges = np.stack(
            [rng.integers(0, 8, 37), rng.integers(0, 5, 37), rng.integers(0, 5, 37)]
        )
        e_b, mask, pos = bucket_edges_by_time(edges, 8, 4, pad_multiple=4)
        n_time, _, Eb = e_b.shape
        flat_t = (e_b[:, 0, :] + np.arange(n_time)[:, None] * 2).reshape(-1)
        flat_i = e_b[:, 1, :].reshape(-1)
        np.testing.assert_array_equal(flat_t[pos], edges[0])
        np.testing.assert_array_equal(flat_i[pos], edges[1])
        assert mask.reshape(-1).sum() == 37


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4), (8, 1), (1, 8)])
class TestForwardParity:
    def test_tmgcn1(self, problem, mesh_shape):
        A, M, X, edges, adj, feats, edict = problem
        model = TMGCN(n_slices=A.n_slices, in_feat=4, hidden_feat=(6, 2))
        ref = make_edge_adapter(model, adj, feats, edict, M=M)
        mesh = make_mesh(*mesh_shape)
        sh = make_sharded_edge_adapter(model, adj, feats, edict, M, mesh)
        variables = ref.init(jax.random.PRNGKey(0))
        out_ref, _ = ref.apply(variables, ref.bundles["train"], ())
        out_sh, _ = sh.apply(sh.init(jax.random.PRNGKey(0)), sh.bundles["train"], ())
        np.testing.assert_allclose(
            np.asarray(out_sh), np.asarray(out_ref), atol=2e-5
        )

    def test_tmgcn2(self, problem, mesh_shape):
        A, M, X, edges, adj, feats, edict = problem
        model = TMGCN2(
            n_slices=A.n_slices, in_feat=4, hidden_feat=(6, 6, 2), nonlin2="selu"
        )
        ref = make_edge_adapter(model, adj, feats, edict, M=M)
        mesh = make_mesh(*mesh_shape)
        sh = make_sharded_edge_adapter(model, adj, feats, edict, M, mesh)
        variables = ref.init(jax.random.PRNGKey(0))
        out_ref, _ = ref.apply(variables, ref.bundles["train"], ())
        out_sh, _ = sh.apply(sh.init(jax.random.PRNGKey(0)), sh.bundles["train"], ())
        np.testing.assert_allclose(
            np.asarray(out_sh), np.asarray(out_ref), atol=2e-5
        )

    @pytest.mark.parametrize("l2_impl", ["blockdense", "gather"])
    def test_tmgcn2_l2_impls(self, problem, mesh_shape, l2_impl):
        """Per-shard block-dense layer-2 == gather/segment layer-2."""
        A, M, X, edges, adj, feats, edict = problem
        model = TMGCN2(n_slices=A.n_slices, in_feat=4, hidden_feat=(6, 6, 2))
        ref = make_edge_adapter(model, adj, feats, edict, M=M)
        mesh = make_mesh(*mesh_shape)
        sh = make_sharded_edge_adapter(
            model, adj, feats, edict, M, mesh, l2_impl=l2_impl
        )
        if l2_impl == "blockdense":
            assert "l2op_parts" in sh.bundles["train"]
        variables = ref.init(jax.random.PRNGKey(0))
        out_ref, _ = ref.apply(variables, ref.bundles["train"], ())
        out_sh, _ = sh.apply(sh.init(jax.random.PRNGKey(0)), sh.bundles["train"], ())
        np.testing.assert_allclose(
            np.asarray(out_sh), np.asarray(out_ref), atol=2e-5
        )


class TestDropLastSlice:
    def test_lp_convention(self, problem):
        """drop_last_slice (LP) path: T-1=7 slices padded to 8."""
        A, M, X, edges, adj, feats, edict = problem
        e = edges.copy()
        e[0] = np.clip(e[0], 0, A.n_slices - 2)
        edict = {w: e for w in ("train", "val", "test")}
        model = TMGCN(n_slices=A.n_slices - 1, in_feat=4, hidden_feat=(6, 2))
        ref = make_edge_adapter(model, adj, feats, edict, M=M, drop_last_slice=True)
        mesh = make_mesh(2, 4)
        sh = make_sharded_edge_adapter(
            model, adj, feats, edict, M, mesh, drop_last_slice=True
        )
        variables = ref.init(jax.random.PRNGKey(3))
        out_ref, _ = ref.apply(variables, ref.bundles["train"], ())
        out_sh, _ = sh.apply(sh.init(jax.random.PRNGKey(3)), sh.bundles["train"], ())
        np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_ref), atol=2e-5)


class TestTrainingLoop:
    def test_losses_match_single_device(self, problem):
        """The standard cls loop on the sharded adapter reproduces the
        single-device losses (the VERDICT 1e-4 criterion)."""
        from tmgcn_tpu.tasks.windows import EdgeSplit
        from tmgcn_tpu.train.loop import TrainConfig, run_edge_classification

        A, M, X, edges, adj, feats, edict = problem
        rng = np.random.default_rng(2)
        tgt = rng.integers(0, 2, edges.shape[1])
        splits = {
            w: EdgeSplit(
                edges=edges, target=tgt, eval_mask=np.ones(edges.shape[1], bool)
            )
            for w in ("train", "val", "test")
        }
        model = TMGCN(n_slices=A.n_slices, in_feat=4, hidden_feat=(6, 2))
        cfg = TrainConfig(n_epochs=6, eval_every=3, lr=1e-3)
        cw = np.array([0.6, 0.4])
        key = jax.random.PRNGKey(5)

        ref = make_edge_adapter(model, adj, feats, edict, M=M)
        res_ref, _ = run_edge_classification(ref, splits, cw, cfg, key=key)

        mesh = make_mesh(4, 2)
        sh = make_sharded_edge_adapter(model, adj, feats, edict, M, mesh)
        res_sh, _ = run_edge_classification(sh, splits, cw, cfg, key=key)

        np.testing.assert_allclose(res_sh[:, 3], res_ref[:, 3], rtol=1e-4)
        np.testing.assert_allclose(res_sh[:, 7], res_ref[:, 7], rtol=1e-3)


def _graph_mesh(n_graph):
    return make_mesh(n_graph, 1, devices=jax.devices()[: n_graph])


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 1)])
class TestRecurrentForwardParity:
    def test_wdgcn(self, problem, mesh_shape):
        from tmgcn_tpu.models.wdgcn import WDGCN

        A, M, X, edges, adj, feats, edict = problem
        model = WDGCN(n_slices=A.n_slices, in_feat=4, hidden_feat=(6, 2))
        ref = make_edge_adapter(model, adj, feats, edict)
        mesh = _graph_mesh(mesh_shape[0])
        sh = make_sharded_edge_adapter(model, adj, feats, edict, None, mesh)
        variables = ref.init(jax.random.PRNGKey(0))
        out_ref, _ = ref.apply(variables, ref.bundles["train"], ())
        out_sh, _ = sh.apply(sh.init(jax.random.PRNGKey(0)), sh.bundles["train"], ())
        np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_ref), atol=2e-5)

    def test_evolvegcn1(self, problem, mesh_shape):
        from tmgcn_tpu.models.evolvegcn import EvolveGCN

        A, M, X, edges, adj, feats, edict = problem
        model = EvolveGCN(n_slices=A.n_slices, in_feat=4, hidden_feat=(4, 2))
        ref = make_edge_adapter(model, adj, feats, edict)
        mesh = _graph_mesh(mesh_shape[0])
        sh = make_sharded_edge_adapter(model, adj, feats, edict, None, mesh)
        variables = ref.init(jax.random.PRNGKey(1))
        out_ref, fin_ref = ref.apply(variables, ref.bundles["train"], ())
        out_sh, fin_sh = sh.apply(
            jax.device_put(variables), sh.bundles["train"], ()
        )
        np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_ref), atol=2e-5)
        # Evolved final weights (the train->val carry) match too.
        np.testing.assert_allclose(
            np.asarray(fin_sh[0]), np.asarray(fin_ref[0]), atol=2e-5
        )

    def test_evolvegcn2(self, problem, mesh_shape):
        from tmgcn_tpu.models.evolvegcn import EvolveGCN

        A, M, X, edges, adj, feats, edict = problem
        model = EvolveGCN(n_slices=A.n_slices, in_feat=4, hidden_feat=(4, 5, 2))
        ref = make_edge_adapter(model, adj, feats, edict)
        mesh = _graph_mesh(mesh_shape[0])
        sh = make_sharded_edge_adapter(model, adj, feats, edict, None, mesh)
        variables = ref.init(jax.random.PRNGKey(2))
        out_ref, fin_ref = ref.apply(variables, ref.bundles["train"], ())
        out_sh, fin_sh = sh.apply(variables, sh.bundles["train"], ())
        np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_ref), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(fin_sh[1]), np.asarray(fin_ref[1]), atol=2e-5
        )

    def test_evolvegcn2_summary_wider_than_shard(self, problem, mesh_shape):
        """k2 > N_loc: the local top-k caps at the shard's row count."""
        from tmgcn_tpu.models.evolvegcn import EvolveGCN

        A, M, X, edges, adj, feats, edict = problem
        model = EvolveGCN(n_slices=A.n_slices, in_feat=4, hidden_feat=(4, 8, 2))
        ref = make_edge_adapter(model, adj, feats, edict)
        mesh = _graph_mesh(mesh_shape[0])
        sh = make_sharded_edge_adapter(model, adj, feats, edict, None, mesh)
        variables = ref.init(jax.random.PRNGKey(3))
        out_ref, _ = ref.apply(variables, ref.bundles["train"], ())
        out_sh, _ = sh.apply(variables, sh.bundles["train"], ())
        np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_ref), atol=2e-5)

    def test_time_sharding_rejected(self, problem, mesh_shape):
        from tmgcn_tpu.models.wdgcn import WDGCN

        A, M, X, edges, adj, feats, edict = problem
        model = WDGCN(n_slices=A.n_slices, in_feat=4, hidden_feat=(6, 2))
        mesh = make_mesh(2, 4)
        with pytest.raises(NotImplementedError):
            make_sharded_edge_adapter(model, adj, feats, edict, None, mesh)


class TestRecurrentTrainingLoop:
    def test_evolvegcn_losses_match(self, problem):
        """EvolveGCN cls loop sharded over graph matches single-device,
        including the evolved-weight carry threading train->val->test."""
        from tmgcn_tpu.models.evolvegcn import EvolveGCN
        from tmgcn_tpu.tasks.windows import EdgeSplit
        from tmgcn_tpu.train.loop import TrainConfig, run_edge_classification

        A, M, X, edges, adj, feats, edict = problem
        rng = np.random.default_rng(7)
        tgt = rng.integers(0, 2, edges.shape[1])
        splits = {
            w: EdgeSplit(
                edges=edges, target=tgt, eval_mask=np.ones(edges.shape[1], bool)
            )
            for w in ("train", "val", "test")
        }
        model = EvolveGCN(n_slices=A.n_slices, in_feat=4, hidden_feat=(4, 2))
        cfg = TrainConfig(n_epochs=4, eval_every=2, lr=1e-3)
        cw = np.array([0.6, 0.4])
        key = jax.random.PRNGKey(11)

        ref = make_edge_adapter(model, adj, feats, edict)
        res_ref, _ = run_edge_classification(ref, splits, cw, cfg, key=key)

        mesh = make_mesh(8, 1)
        sh = make_sharded_edge_adapter(model, adj, feats, edict, None, mesh)
        res_sh, _ = run_edge_classification(sh, splits, cw, cfg, key=key)

        np.testing.assert_allclose(res_sh[:, 3], res_ref[:, 3], rtol=1e-4)
        np.testing.assert_allclose(res_sh[:, 7], res_ref[:, 7], rtol=1e-3)


class TestRegressionParity:
    """Sharded regression adapters vs tasks.adapters.make_regression_adapter."""

    @pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4), (8, 1)])
    def test_tmgcn_reg(self, problem, mesh_shape):
        from tmgcn_tpu.models.tmgcn import TMGCNReg
        from tmgcn_tpu.parallel.adapter import make_sharded_regression_adapter
        from tmgcn_tpu.tasks.adapters import make_regression_adapter

        A, M, X, edges, adj, feats, edict = problem
        model = TMGCNReg(n_slices=A.n_slices, in_feat=4, hidden_feat=(6, 1))
        ref = make_regression_adapter(model, adj, feats, M=M)
        sh = make_sharded_regression_adapter(
            model, adj, feats, M, make_mesh(*mesh_shape)
        )
        variables = ref.init(jax.random.PRNGKey(0))
        out_ref, _ = ref.apply(variables, ref.bundles["train"], ())
        out_sh, _ = sh.apply(variables, sh.bundles["train"], ())
        assert out_sh.shape == out_ref.shape == (A.n_slices, A.n_nodes)
        np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_ref), atol=2e-5)

    def test_evolvegcn_reg(self, problem):
        from tmgcn_tpu.models.evolvegcn import EvolveGCNReg
        from tmgcn_tpu.parallel.adapter import make_sharded_regression_adapter
        from tmgcn_tpu.tasks.adapters import make_regression_adapter

        A, M, X, edges, adj, feats, edict = problem
        model = EvolveGCNReg(n_slices=A.n_slices, in_feat=4, hidden_feat=(4, 1))
        ref = make_regression_adapter(model, adj, feats)
        sh = make_sharded_regression_adapter(
            model, adj, feats, None, make_mesh(8, 1)
        )
        variables = ref.init(jax.random.PRNGKey(1))
        out_ref, _ = ref.apply(variables, ref.bundles["train"], ())
        out_sh, _ = sh.apply(variables, sh.bundles["train"], ())
        np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_ref), atol=2e-5)

    def test_wdgcn_reg(self, problem):
        from tmgcn_tpu.models.wdgcn import WDGCNReg
        from tmgcn_tpu.parallel.adapter import make_sharded_regression_adapter
        from tmgcn_tpu.tasks.adapters import make_regression_adapter

        A, M, X, edges, adj, feats, edict = problem
        model = WDGCNReg(n_slices=A.n_slices, in_feat=4, hidden_feat=(6, 1))
        ref = make_regression_adapter(model, adj, feats)
        sh = make_sharded_regression_adapter(
            model, adj, feats, None, make_mesh(8, 1)
        )
        variables = ref.init(jax.random.PRNGKey(2))
        out_ref, _ = ref.apply(variables, ref.bundles["train"], ())
        out_sh, _ = sh.apply(variables, sh.bundles["train"], ())
        np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_ref), atol=2e-5)

    def test_regression_loop_losses_match(self, problem):
        from tmgcn_tpu.models.tmgcn import TMGCNReg
        from tmgcn_tpu.parallel.adapter import make_sharded_regression_adapter
        from tmgcn_tpu.tasks.adapters import make_regression_adapter
        from tmgcn_tpu.train.loop import TrainConfig, run_regression

        A, M, X, edges, adj, feats, edict = problem
        rng = np.random.default_rng(3)
        targets = {
            w: rng.standard_normal((A.n_slices, A.n_nodes)).astype(np.float32)
            for w in ("train", "val", "test")
        }
        model = TMGCNReg(n_slices=A.n_slices, in_feat=4, hidden_feat=(6, 1))
        cfg = TrainConfig(n_epochs=5, eval_every=2, lr=1e-3)
        key = jax.random.PRNGKey(4)

        ref = make_regression_adapter(model, adj, feats, M=M)
        res_ref, _ = run_regression(ref, targets, cfg, key=key)

        sh = make_sharded_regression_adapter(model, adj, feats, M, make_mesh(4, 2))
        res_sh, _ = run_regression(sh, targets, cfg, key=key)

        np.testing.assert_allclose(
            res_sh["train_loss"], res_ref["train_loss"], rtol=1e-4
        )
        np.testing.assert_allclose(res_sh["val_l1"], res_ref["val_l1"], rtol=1e-3)


@pytest.mark.parametrize("mesh_shape", [(4, 2), (1, 8)])
class TestKWGCNAndMTwiceParity:
    """Round-3 scope-guard closures: sharded KWGCN and the UCI
    apply_M_twice/apply_M_three_times layer-2 (VERDICT round-2 #4)."""

    def test_kwgcn1(self, problem, mesh_shape):
        from tmgcn_tpu.models.gcn import KWGCN

        A, M, X, edges, adj, feats, edict = problem
        model = KWGCN(n_slices=A.n_slices, in_feat=4, hidden_feat=(6, 2))
        ref = make_edge_adapter(model, adj, feats, edict)
        mesh = make_mesh(*mesh_shape)
        sh = make_sharded_edge_adapter(model, adj, feats, edict, None, mesh)
        variables = ref.init(jax.random.PRNGKey(0))
        out_ref, _ = ref.apply(variables, ref.bundles["train"], ())
        out_sh, _ = sh.apply(sh.init(jax.random.PRNGKey(0)), sh.bundles["train"], ())
        np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_ref), atol=2e-5)

    def test_kwgcn2(self, problem, mesh_shape):
        from tmgcn_tpu.models.gcn import KWGCN

        A, M, X, edges, adj, feats, edict = problem
        model = KWGCN(
            n_slices=A.n_slices, in_feat=4, hidden_feat=(6, 6, 2), nonlin2="selu"
        )
        ref = make_edge_adapter(model, adj, feats, edict)
        mesh = make_mesh(*mesh_shape)
        sh = make_sharded_edge_adapter(model, adj, feats, edict, None, mesh)
        variables = ref.init(jax.random.PRNGKey(1))
        out_ref, _ = ref.apply(variables, ref.bundles["train"], ())
        out_sh, _ = sh.apply(sh.init(jax.random.PRNGKey(1)), sh.bundles["train"], ())
        np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_ref), atol=2e-5)

    @pytest.mark.parametrize("m3", [False, True])
    def test_tmgcn2_m_twice(self, problem, mesh_shape, m3):
        A, M, X, edges, adj, feats, edict = problem
        model = TMGCN2(
            n_slices=A.n_slices, in_feat=4, hidden_feat=(6, 6, 2),
            nonlin2="selu", apply_M_twice=True, apply_M_three_times=m3,
        )
        ref = make_edge_adapter(model, adj, feats, edict, M=M)
        mesh = make_mesh(*mesh_shape)
        sh = make_sharded_edge_adapter(model, adj, feats, edict, M, mesh)
        variables = ref.init(jax.random.PRNGKey(2))
        out_ref, _ = ref.apply(variables, ref.bundles["train"], ())
        out_sh, _ = sh.apply(sh.init(jax.random.PRNGKey(2)), sh.bundles["train"], ())
        np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_ref), atol=2e-5)

    def test_kwgcn_disjoint_window_widths(self, problem, mesh_shape):
        """KWGCN baselines use disjoint windows of DIFFERENT widths; the
        per-window identity M must size to each (round-3 CLI bug)."""
        from tmgcn_tpu.models.gcn import KWGCN

        A, M, X, edges, adj, feats, edict = problem
        rng = np.random.default_rng(7)
        adj2 = {"train": A, "val": A.slice_window(0, 4), "test": A.slice_window(4, 8)}
        feats2 = {"train": X, "val": X[:4], "test": X[4:]}
        e_val = edges.copy()
        e_val[0] = rng.integers(0, 4, edges.shape[1])
        edict2 = {"train": edges, "val": e_val, "test": e_val}
        model = KWGCN(n_slices=A.n_slices, in_feat=4, hidden_feat=(6, 2))
        ref = make_edge_adapter(model, adj2, feats2, edict2)
        mesh = make_mesh(*mesh_shape)
        sh = make_sharded_edge_adapter(model, adj2, feats2, edict2, None, mesh)
        variables = ref.init(jax.random.PRNGKey(0))
        for w in ("train", "val", "test"):
            out_ref, _ = ref.apply(variables, ref.bundles[w], ())
            out_sh, _ = sh.apply(variables, sh.bundles[w], ())
            np.testing.assert_allclose(
                np.asarray(out_sh), np.asarray(out_ref), atol=2e-5
            )


class TestTrainStats:
    """Collective-light train statistics vs the logit path.

    train_stats computes the weighted-CE loss and confusion counts on
    the time-SHARDED bucket logits (no (E, C) all-gather — the comm
    model's eval-step cap); the values must match the apply() path's
    logits to reassociation tolerance.
    """

    @pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2), (1, 8)])
    def test_matches_logit_path(self, problem, mesh_shape):
        from tmgcn_tpu.train.losses import weighted_cross_entropy

        A, M, X, edges, adj, feats, edict = problem
        model = TMGCN(n_slices=A.n_slices, in_feat=4, hidden_feat=(6, 2))
        mesh = make_mesh(*mesh_shape)
        sh = make_sharded_edge_adapter(model, adj, feats, edict, M, mesh)
        assert sh.train_stats is not None
        variables = sh.init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(3)
        tgt = jnp.asarray(rng.integers(0, 2, edges.shape[1]))
        cw = jnp.asarray(np.array([0.9, 0.1], np.float32))

        out, _ = sh.apply(variables, sh.bundles["train"], ())
        loss_ref = weighted_cross_entropy(out, tgt, cw)
        guess = jnp.argmax(out, axis=1)
        conf_ref = (
            int(jnp.sum((guess == 0) & (tgt == 0))),
            int(jnp.sum((guess == 0) & (tgt != 0))),
            int(jnp.sum((guess != 0) & (tgt == 0))),
        )

        loss, (tp, fp, fn) = sh.train_stats(
            variables, sh.bundles["train"], tgt, cw
        )
        np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
        assert (int(tp), int(fp), int(fn)) == conf_ref

    def test_chunked_loop_uses_stats(self, problem):
        """run_edge_classification on a sharded adapter converges the
        same losses whether the stats path exists or not."""
        import dataclasses as dc

        from tmgcn_tpu.tasks.windows import EdgeSplit
        from tmgcn_tpu.train.loop import TrainConfig, run_edge_classification

        A, M, X, edges, adj, feats, edict = problem
        model = TMGCN(n_slices=A.n_slices, in_feat=4, hidden_feat=(6, 2))
        mesh = make_mesh(2, 4)
        sh = make_sharded_edge_adapter(model, adj, feats, edict, M, mesh)
        rng = np.random.default_rng(4)
        tgt = rng.integers(0, 2, edges.shape[1])
        splits = {
            w: EdgeSplit(
                edges=edges, target=tgt, eval_mask=np.ones(len(tgt), bool)
            )
            for w in ("train", "val", "test")
        }
        cfg = TrainConfig(n_epochs=6, eval_every=3, lr=0.01, momentum=0.9)
        res_stats, _ = run_edge_classification(
            sh, splits, np.array([0.9, 0.1]), cfg, key=jax.random.PRNGKey(0)
        )
        no_stats = dc.replace(sh, train_stats=None)
        res_plain, _ = run_edge_classification(
            no_stats, splits, np.array([0.9, 0.1]), cfg,
            key=jax.random.PRNGKey(0),
        )
        np.testing.assert_allclose(
            res_stats[:, 3], res_plain[:, 3], rtol=2e-4
        )
        np.testing.assert_allclose(res_stats[:, :3], res_plain[:, :3], atol=1e-6)
