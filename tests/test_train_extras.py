"""Checkpointing, metric logging, and profiling accounting."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tmgcn_tpu.train.checkpoint import RunCheckpointer
from tmgcn_tpu.train.logging import summarize, write_metrics_jsonl
from tmgcn_tpu.utils.profiling import OpCost, m_transform_cost, spmm_cost


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        params = {"W": jnp.ones((4, 3)), "U": jnp.zeros((6, 2))}
        opt = optax.sgd(0.01, momentum=0.9)
        opt_state = opt.init(params)
        results = np.arange(24, dtype=np.float64).reshape(2, 12)

        ckpt = RunCheckpointer(tmp_path / "run0")
        buffers = {"U": jnp.ones((2, 2))}
        ckpt.save(100, params, opt_state, results, buffers=buffers)
        assert ckpt.latest_epoch() == 100

        template = {"params": params, "opt_state": opt_state,
                    "results": results, "buffers": buffers}
        step, restored = ckpt.restore(jax.tree.map(np.zeros_like, template))
        assert step == 100
        np.testing.assert_allclose(np.asarray(restored["params"]["W"]), 1.0)
        np.testing.assert_allclose(restored["results"], results)
        ckpt.close()

    def test_resume_in_training_loop(self, tmp_path):
        """Checkpointer hook fires during run_edge_classification."""
        from tmgcn_tpu.core.mmatrix import make_m_matrix
        from tmgcn_tpu.core.sparse import TemporalCOO
        from tmgcn_tpu.models.tmgcn import TMGCN
        from tmgcn_tpu.tasks.adapters import make_edge_adapter
        from tmgcn_tpu.tasks.windows import EdgeSplit
        from tmgcn_tpu.train.loop import TrainConfig, run_edge_classification

        rng = np.random.default_rng(0)
        T, N = 4, 30
        dense = (rng.random((T, N, N)) < 0.1) * 1.0
        A = TemporalCOO.from_dense(dense, dtype=jnp.float64, pad_multiple=16)
        M = make_m_matrix(T, 2)
        X = rng.standard_normal((T, N, 2))
        edges = np.stack(
            [rng.integers(0, T, 40), rng.integers(0, N, 40), rng.integers(0, N, 40)]
        )
        splits = {
            w: EdgeSplit(
                edges=edges,
                target=rng.integers(0, 2, 40),
                eval_mask=np.ones(40, bool),
            )
            for w in ("train", "val", "test")
        }
        model = TMGCN(n_slices=T, in_feat=2, hidden_feat=(4, 2), dtype=jnp.float64)
        adapter = make_edge_adapter(
            model, {w: A for w in splits}, {w: X for w in splits},
            {w: splits[w].edges for w in splits}, M=M,
        )
        ckpt = RunCheckpointer(tmp_path / "loop")
        cfg = TrainConfig(n_epochs=5, eval_every=2, lr=1e-4)
        results, variables = run_edge_classification(
            adapter, splits, np.array([0.9, 0.1]), cfg, checkpointer=ckpt
        )
        assert ckpt.latest_epoch() == 4
        ckpt.close()


class TestPredictCLI:
    def test_train_then_predict(self, tmp_path, monkeypatch):
        """cli predict restores a run's checkpoint and scores a window."""
        import dataclasses

        from tmgcn_tpu.cli import main as cli_main
        from tmgcn_tpu.configs import presets
        from tmgcn_tpu.configs.presets import PRESETS, get_preset

        tiny = dataclasses.replace(
            get_preset("sbm_tmgcn_lp"), name="sbm_tiny_lp",
            sbm_n_nodes=60, sbm_n_slices=10, beta1=2, beta2=2, eval_every=2,
        )
        monkeypatch.setitem(PRESETS, "sbm_tiny_lp", tiny)
        ck = str(tmp_path / "ck")
        assert cli_main([
            "run", "sbm_tiny_lp", "--epochs", "4",
            "--checkpoint-dir", ck, "--quiet",
        ]) == 0
        out = tmp_path / "scores.npz"
        assert cli_main([
            "predict", "sbm_tiny_lp", "--checkpoint-dir", ck,
            "--window", "val", "--out", str(out),
        ]) == 0
        z = np.load(out)
        assert z["scores"].ndim == 2 and np.isfinite(z["scores"]).all()
        assert z["edges"].shape[0] == 3


class TestLogging:
    def test_jsonl_and_summary(self, tmp_path):
        rng = np.random.default_rng(1)
        results = rng.random((10, 9))
        results[4, 3] = 0.99  # best val MAP at epoch 4
        path = tmp_path / "m.jsonl"
        write_metrics_jsonl(path, results, eval_every=2, run_info={"preset": "x"})
        lines = [json.loads(l) for l in path.read_text().splitlines()]
        assert lines[0]["epoch"] == 0 and lines[-1]["epoch"] == 9
        assert all("map_val" in l and l["preset"] == "x" for l in lines)

        s = summarize(results, eval_every=2)
        assert s["best_epoch"] == 4
        assert s["best_map_val"] == pytest.approx(0.99)

    def test_f1_layout(self, tmp_path):
        results = np.random.default_rng(2).random((6, 12))
        s = summarize(results, eval_every=3)
        assert "best_f1_val" in s and "final_f1_test" in s


class TestRoofline:
    def test_costs(self):
        c = spmm_cost(nnz=1_000_000, n_rows=8192, feat=128)
        assert c.flops == pytest.approx(2 * 1_000_000 * 128)
        t = c.roofline_seconds()
        assert 0 < t < 1
        # measured 4x slower than roofline -> 25%
        assert c.roofline_fraction(4 * t) == pytest.approx(0.25)

    def test_banded_mtransform(self):
        full = m_transform_cost(80, 7301, 6)
        banded = m_transform_cost(80, 7301, 6, band=20)
        assert banded.flops == pytest.approx(full.flops * 20 / 80)


class TestResume:
    def test_classification_resumes_from_checkpoint(self, tmp_path):
        import jax.numpy as jnp

        from tmgcn_tpu.core.mmatrix import make_m_matrix
        from tmgcn_tpu.core.sparse import TemporalCOO
        from tmgcn_tpu.models.tmgcn import TMGCN
        from tmgcn_tpu.tasks.adapters import make_edge_adapter
        from tmgcn_tpu.tasks.windows import EdgeSplit
        from tmgcn_tpu.train.loop import TrainConfig, run_edge_classification

        rng = np.random.default_rng(3)
        T, N = 4, 30
        dense = (rng.random((T, N, N)) < 0.1) * 1.0
        A = TemporalCOO.from_dense(dense, dtype=jnp.float64, pad_multiple=16)
        M = make_m_matrix(T, 2)
        X = rng.standard_normal((T, N, 2))
        edges = np.stack(
            [rng.integers(0, T, 40), rng.integers(0, N, 40), rng.integers(0, N, 40)]
        )
        splits = {
            w: EdgeSplit(edges=edges, target=rng.integers(0, 2, 40),
                         eval_mask=np.ones(40, bool))
            for w in ("train", "val", "test")
        }
        model = TMGCN(n_slices=T, in_feat=2, hidden_feat=(4, 2), dtype=jnp.float64)
        adapter = make_edge_adapter(
            model, {w: A for w in splits}, {w: X for w in splits},
            {w: splits[w].edges for w in splits}, M=M,
        )
        cw = np.array([0.9, 0.1])
        key = jax.random.PRNGKey(7)

        # Uninterrupted 8-epoch run.
        cfg8 = TrainConfig(n_epochs=8, eval_every=4, lr=1e-4)
        full, _ = run_edge_classification(adapter, splits, cw, cfg8, key=key)

        # 4 epochs + checkpoint, then resume to 8 with a fresh loop.
        ck = RunCheckpointer(tmp_path / "resume")
        cfg4 = TrainConfig(n_epochs=4, eval_every=4, lr=1e-4)
        run_edge_classification(adapter, splits, cw, cfg4, key=key, checkpointer=ck)
        resumed, _ = run_edge_classification(
            adapter, splits, cw, cfg8, key=key, checkpointer=ck
        )
        ck.close()
        # Identical training losses after the resume point.
        np.testing.assert_allclose(resumed[4:, 3], full[4:, 3], rtol=1e-10)

    def test_sharded_classification_resumes_from_checkpoint(self, tmp_path):
        """Resume works when the adapter/variables are mesh-sharded."""
        import jax.numpy as jnp

        from tmgcn_tpu.core.mmatrix import make_m_matrix
        from tmgcn_tpu.core.sparse import TemporalCOO
        from tmgcn_tpu.models.tmgcn import TMGCN
        from tmgcn_tpu.parallel.adapter import make_sharded_edge_adapter
        from tmgcn_tpu.parallel.mesh import make_mesh
        from tmgcn_tpu.tasks.windows import EdgeSplit
        from tmgcn_tpu.train.loop import TrainConfig, run_edge_classification

        rng = np.random.default_rng(9)
        T, N = 4, 32
        dense = (rng.random((T, N, N)) < 0.15) * 1.0
        A = TemporalCOO.from_dense(dense, dtype=jnp.float32, pad_multiple=16)
        M = make_m_matrix(T, 2)
        X = rng.standard_normal((T, N, 2)).astype(np.float32)
        edges = np.stack(
            [np.sort(rng.integers(0, T, 40)), rng.integers(0, N, 40),
             rng.integers(0, N, 40)]
        )
        splits = {
            w: EdgeSplit(edges=edges, target=rng.integers(0, 2, 40),
                         eval_mask=np.ones(40, bool))
            for w in ("train", "val", "test")
        }
        model = TMGCN(n_slices=T, in_feat=2, hidden_feat=(4, 2))
        adapter = make_sharded_edge_adapter(
            model, {w: A for w in splits}, {w: X for w in splits},
            {w: splits[w].edges for w in splits}, M, make_mesh(4, 2),
        )
        cw = np.array([0.9, 0.1])
        key = jax.random.PRNGKey(11)

        cfg8 = TrainConfig(n_epochs=8, eval_every=4, lr=1e-4)
        full, _ = run_edge_classification(adapter, splits, cw, cfg8, key=key)

        ck = RunCheckpointer(tmp_path / "sharded_resume")
        cfg4 = TrainConfig(n_epochs=4, eval_every=4, lr=1e-4)
        run_edge_classification(adapter, splits, cw, cfg4, key=key, checkpointer=ck)
        resumed, _ = run_edge_classification(
            adapter, splits, cw, cfg8, key=key, checkpointer=ck
        )
        ck.close()
        np.testing.assert_allclose(resumed[4:, 3], full[4:, 3], rtol=1e-5)

    def test_regression_resumes_from_checkpoint(self, tmp_path):
        """run_regression continues from the latest checkpoint (the
        reference never persists model state — SURVEY.md §5; this is the
        analog of the cls/LP resume contract for the SEIR task)."""
        import jax.numpy as jnp

        from tmgcn_tpu.core.mmatrix import make_m_matrix
        from tmgcn_tpu.core.sparse import TemporalCOO
        from tmgcn_tpu.models.tmgcn import TMGCNReg
        from tmgcn_tpu.tasks.adapters import make_regression_adapter
        from tmgcn_tpu.train.loop import TrainConfig, run_regression

        rng = np.random.default_rng(5)
        T, N = 4, 30
        dense = (rng.random((T, N, N)) < 0.1) * 1.0
        A = TemporalCOO.from_dense(dense, dtype=jnp.float64, pad_multiple=16)
        M = make_m_matrix(T, 2)
        X = rng.standard_normal((T, N, 2))
        targets = {w: rng.standard_normal((T, N)) for w in ("train", "val", "test")}
        model = TMGCNReg(n_slices=T, in_feat=2, hidden_feat=(4, 2), dtype=jnp.float64)
        adapter = make_regression_adapter(
            model, {w: A for w in targets}, {w: X for w in targets}, M=M
        )
        key = jax.random.PRNGKey(11)

        cfg8 = TrainConfig(n_epochs=8, eval_every=4, lr=1e-4)
        full, _ = run_regression(adapter, targets, cfg8, key=key)

        ck = RunCheckpointer(tmp_path / "reg_resume")
        cfg4 = TrainConfig(n_epochs=4, eval_every=4, lr=1e-4)
        run_regression(adapter, targets, cfg4, key=key, checkpointer=ck)
        resumed, _ = run_regression(adapter, targets, cfg8, key=key, checkpointer=ck)
        ck.close()
        np.testing.assert_allclose(
            resumed["train_loss"][4:], full["train_loss"][4:], rtol=1e-10
        )
        assert resumed["val_l1"] == pytest.approx(full["val_l1"], rel=1e-10)
