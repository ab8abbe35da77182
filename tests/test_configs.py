"""Config layer: preset registry integrity and experiment assembly."""

import dataclasses

import numpy as np
import pytest

from tmgcn_tpu.configs.build import build_data, build_model, run_experiment
from tmgcn_tpu.configs.presets import PRESETS, get_preset
from tmgcn_tpu.configs.schema import ExperimentConfig


class TestPresets:
    def test_registry_covers_reference_matrix(self):
        # 5 cls datasets x 4 methods + 5 lp datasets x 4 methods
        # + 2 sbm lp (+2 tuned, +1 spectral) + 3 seir reg (+3 tuned)
        # + the chess 2-layer bench configs (chess_tmgcn2_cls,
        #   chess_evolvegcn2_cls).
        assert len(PRESETS) == 20 + 20 + 5 + 6 + 2
        for name, cfg in PRESETS.items():
            assert cfg.name == name

    def test_all_presets_build_models(self):
        for cfg in PRESETS.values():
            model = build_model(cfg, n_slices=10, in_feat=2)
            assert model is not None

    def test_uci_two_layer_config(self):
        cfg = get_preset("uci_tmgcn_lp")
        assert cfg.n_layers == 2
        assert cfg.apply_M_twice and cfg.apply_M_three_times

    def test_chess_has_no_alpha_sweep(self):
        assert len(get_preset("chess_tmgcn_cls").alpha_vec) == 1

    def test_unknown_preset(self):
        with pytest.raises(KeyError):
            get_preset("nope")

    def test_invalid_configs_rejected(self):
        with pytest.raises(ValueError):
            ExperimentConfig(
                name="x", dataset="sbm", method="tmgcn", task="link_pred",
                apply_M_three_times=True,
            )
        with pytest.raises(ValueError):
            ExperimentConfig(name="x", dataset="sbm", method="bad", task="link_pred")


class TestBuildData:
    def test_sbm_windows_scale_with_slices(self):
        cfg = dataclasses.replace(
            get_preset("sbm_tmgcn_lp"), sbm_n_nodes=60, sbm_n_slices=20
        )
        data = build_data(cfg)
        assert data.spec.total == 20
        assert data.spec.s_train == 14
        assert data.adj["train"].n_slices == 14

    def test_standardize_features(self):
        cfg = dataclasses.replace(
            get_preset("sbm_tmgcn_lp"),
            sbm_n_nodes=60,
            sbm_n_slices=20,
            standardize_features=True,
        )
        data = build_data(cfg)
        tr = data.feats["train"]
        np.testing.assert_allclose(tr.mean(axis=(0, 1)), 0.0, atol=1e-6)
        np.testing.assert_allclose(tr.std(axis=(0, 1)), 1.0, atol=1e-2)

    def test_missing_data_dir_raises(self):
        with pytest.raises(FileNotFoundError):
            build_data(get_preset("bitcoin_otc_tmgcn_cls"))


class TestRunExperimentSmoke:
    def test_tiny_sbm_with_adam_clip(self):
        cfg = dataclasses.replace(
            get_preset("sbm_tmgcn_lp_tuned"),
            sbm_n_nodes=50,
            sbm_n_slices=10,
            beta1=2,
            beta2=2,
        )
        out = run_experiment(cfg, n_epochs=4, verbose=False)
        res = out["results"][(0, 0.9)]
        assert res.shape == (4, 9)
        assert np.isfinite(res[:, 2]).all()


class TestDtypes:
    def test_bfloat16_training_mode(self):
        """Production bf16 end-to-end: finite, decreasing losses."""
        cfg = dataclasses.replace(
            get_preset("sbm_tmgcn_lp"), sbm_n_nodes=50, sbm_n_slices=10,
            beta1=2, beta2=2, dtype="bfloat16",
        )
        res = run_experiment(cfg, n_epochs=4, verbose=False)["results"][(0, 0.9)]
        losses = np.asarray(res)[:, 2]
        assert np.isfinite(losses).all()


class TestDeterminism:
    def test_same_seed_identical_results(self):
        cfg = dataclasses.replace(
            get_preset("sbm_tmgcn_lp"), sbm_n_nodes=50, sbm_n_slices=10,
            beta1=2, beta2=2,
        )
        r1 = run_experiment(cfg, n_epochs=3, verbose=False)["results"][(0, 0.9)]
        r2 = run_experiment(cfg, n_epochs=3, verbose=False)["results"][(0, 0.9)]
        np.testing.assert_array_equal(r1, r2)

    def test_different_seed_differs(self):
        cfg = dataclasses.replace(
            get_preset("sbm_tmgcn_lp"), sbm_n_nodes=50, sbm_n_slices=10,
            beta1=2, beta2=2,
        )
        r1 = run_experiment(cfg, n_epochs=3, verbose=False)["results"][(0, 0.9)]
        cfg2 = dataclasses.replace(cfg, seed=1)
        r2 = run_experiment(cfg2, n_epochs=3, verbose=False)["results"][(0, 0.9)]
        assert not np.array_equal(r1, r2)
