"""SBM link prediction as a real accuracy regression test.

The reference's SBM protocol (degree features + additive concat readout,
SBM_our.py:151-158) is unlearnable: every node's expected degree is
equal, and the additive head cannot express same-community affinity, so
trained MAP stays at the 1/(1+beta) = 0.05 negative-sampling base rate.
With spectral features (ops/degree.spectral_features_np) and the
bilinear readout extension (ops/edge_readout.edge_readout_bilinear),
MAP climbs to the community-signal ceiling (~0.09 at beta=19 and
p_in/p_out = 10: real edges are ~91% within-community, uniform fakes
~50%, so top-bucket precision ≈ 0.91/(0.91 + 0.5*19) ≈ 0.087).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmgcn_tpu.configs.build import run_experiment
from tmgcn_tpu.configs.presets import get_preset


class TestBilinearReadout:
    def test_model_apply_matches_manual(self):
        from tmgcn_tpu.core.mmatrix import make_m_matrix
        from tmgcn_tpu.core.sparse import TemporalCOO
        from tmgcn_tpu.models.tmgcn import TMGCN

        rng = np.random.default_rng(0)
        T, N, F, E = 4, 20, 3, 30
        A = TemporalCOO.from_dense(
            (rng.random((T, N, N)) < 0.1).astype(np.float64), dtype=jnp.float32
        )
        X = jnp.asarray(rng.standard_normal((T, N, F)), jnp.float32)
        M = jnp.asarray(make_m_matrix(T, 2), jnp.float32)
        edges = jnp.asarray(
            np.stack([rng.integers(0, T, E), rng.integers(0, N, E), rng.integers(0, N, E)]),
            jnp.int32,
        )
        model = TMGCN(n_slices=T, in_feat=F, hidden_feat=(5, 2), readout="bilinear")
        variables = model.init(jax.random.PRNGKey(0))
        assert variables["params"]["U"].shape == (5, 2)

        logits = model.apply(variables, A, X, edges, M)
        Y = model.embed(variables, A, X, M)
        flat = Y.reshape(T * N, -1)
        src = flat[edges[0] * N + edges[1]]
        trg = flat[edges[0] * N + edges[2]]
        manual = (src * trg) @ variables["params"]["U"]
        np.testing.assert_allclose(np.asarray(logits), np.asarray(manual), atol=1e-6)

    def test_fast_adapter_matches_model(self):
        from tmgcn_tpu.core.mmatrix import make_m_matrix
        from tmgcn_tpu.core.sparse import TemporalCOO
        from tmgcn_tpu.models.tmgcn import TMGCN
        from tmgcn_tpu.tasks.adapters import make_edge_adapter

        rng = np.random.default_rng(1)
        T, N, F, E = 4, 20, 3, 30
        A = TemporalCOO.from_dense(
            (rng.random((T, N, N)) < 0.1).astype(np.float64), dtype=jnp.float32
        )
        X = rng.standard_normal((T, N, F)).astype(np.float32)
        M = make_m_matrix(T, 2)
        edges = np.stack(
            [rng.integers(0, T, E), rng.integers(0, N, E), rng.integers(0, N, E)]
        )
        model = TMGCN(n_slices=T, in_feat=F, hidden_feat=(5, 2), readout="bilinear")
        adapter = make_edge_adapter(
            model,
            {w: A for w in ("train", "val", "test")},
            {w: X for w in ("train", "val", "test")},
            {w: edges for w in ("train", "val", "test")},
            M=M,
        )
        variables = adapter.init(jax.random.PRNGKey(2))
        fast, _ = adapter.apply(variables, adapter.bundles["train"], ())
        generic = model.apply(
            variables, A, jnp.asarray(X), jnp.asarray(edges), jnp.asarray(M, jnp.float32)
        )
        np.testing.assert_allclose(np.asarray(fast), np.asarray(generic), atol=1e-5)


class TestSbmSpectralMap:
    def test_map_rises_above_base_rate(self):
        cfg = dataclasses.replace(
            get_preset("sbm_tmgcn_lp_spectral"),
            sbm_n_nodes=400,
            sbm_n_slices=24,
            sbm_node_change=4,
            n_epochs=700,
            eval_every=350,
        )
        out = run_experiment(cfg, verbose=False)
        res = next(iter(out["results"].values()))
        # layout: [map_tr, mrr_tr, loss_tr, map_val, ...]
        base_rate = 1.0 / (1.0 + cfg.beta1)
        assert abs(res[0, 0] - base_rate) < 0.02, f"epoch-0 MAP {res[0, 0]}"
        assert res[-1, 0] > 0.07, f"trained MAP {res[-1, 0]} did not learn"
        assert res[-1, 3] > 0.065, f"val MAP {res[-1, 3]} did not learn"
