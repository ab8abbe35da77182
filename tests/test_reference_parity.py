"""Numerical parity vs the actual reference implementation.

Every test builds identical inputs, loads the reference PyTorch modules
from /root/reference (heavy unused imports stubbed), copies the
reference's randomly-initialized parameters into our variable trees, and
compares outputs.

Two regimes:
  * strict f64 — the reference runs under
    ``torch.set_default_dtype(float64)`` so its internal ``t.zeros``
    buffers are f64 too; ours runs with dtype=f64. Agreement to 1e-12
    proves algorithmic equivalence.
  * f32 semantics — the reference runs as shipped (f32 params, f32
    buffers truncating f64 SpMM results); ours runs with dtype=f32 and
    the matching truncation points. Agreement to f32 tolerances proves
    the production-precision path mirrors the reference.
"""

import contextlib

import numpy as np
import pytest

from tests.reference_loader import load_reference_module, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree or torch unavailable"
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tmgcn_tpu.core.mmatrix import make_m_matrix  # noqa: E402
from tmgcn_tpu.core.sparse import TemporalCOO  # noqa: E402

T, N, F0 = 6, 25, 2
E = 30


@pytest.fixture(scope="module")
def torch():
    import torch

    return torch


@contextlib.contextmanager
def default_dtype(torch, dtype):
    old = torch.get_default_dtype()
    torch.set_default_dtype(dtype)
    patched = None
    if dtype == torch.float64:
        # The reference hard-codes a ``.float()`` head cast
        # (embedding_help_functions.py:355); in the strict-f64 oracle run
        # that cast must be the identity.
        patched = torch.Tensor.float
        torch.Tensor.float = lambda self, *a, **k: self.double()
    try:
        yield
    finally:
        torch.set_default_dtype(old)
        if patched is not None:
            torch.Tensor.float = patched


@pytest.fixture(scope="module")
def ehf():
    return load_reference_module("embedding_help_functions")


@pytest.fixture(scope="module")
def data(torch):
    rng = np.random.default_rng(0)
    dense = ((rng.random((T, N, N)) < 0.15) * rng.random((T, N, N))).astype(np.float64)
    X = rng.standard_normal((T, N, F0))
    edges = np.stack(
        [rng.integers(0, T, E), rng.integers(0, N, E), rng.integers(0, N, E)]
    )
    M = make_m_matrix(T, 3)

    At_list = []
    for k in range(T):
        r, c = np.nonzero(dense[k])
        idx = torch.tensor(np.stack([r, c]), dtype=torch.long)
        At_list.append(
            torch.sparse_coo_tensor(idx, torch.tensor(dense[k][r, c]), (N, N)).coalesce()
        )
    return {
        "dense": dense,
        "A": TemporalCOO.from_dense(dense, dtype=jnp.float64, pad_multiple=16),
        "X": X,
        "edges": edges,
        "M": M,
        "At_torch": At_list,
        "X_torch": torch.tensor(X, dtype=torch.float64),
        "edges_torch": torch.tensor(edges, dtype=torch.long),
        "M_torch": torch.tensor(M, dtype=torch.float64),
    }


def _t2n(x):
    return x.detach().cpu().numpy()


def _ours_args(data):
    return (
        data["A"],
        jnp.asarray(data["X"]),
        jnp.asarray(data["edges"]),
        jnp.asarray(data["M"]),
    )


class TestTMGCN1Layer:
    @pytest.mark.parametrize("use_Minv", [False, True])
    def test_forward_strict_f64(self, ehf, torch, data, use_Minv):
        with default_dtype(torch, torch.float64):
            ref = ehf.EmbeddingGCN(
                data["At_torch"],
                data["X_torch"],
                data["edges_torch"],
                data["M_torch"],
                hidden_feat=[4, 2],
                condensed_W=True,
                use_Minv=use_Minv,
            )
            out_ref = _t2n(ref())

        from tmgcn_tpu.models.tmgcn import TMGCN

        model = TMGCN(
            n_slices=T, in_feat=F0, hidden_feat=(4, 2), use_Minv=use_Minv,
            dtype=jnp.float64,
        )
        variables = {
            "params": {"W": jnp.asarray(_t2n(ref.W)), "U": jnp.asarray(_t2n(ref.U))},
            "buffers": {},
        }
        out_ours = np.asarray(model.apply(variables, *_ours_args(data)))
        np.testing.assert_allclose(out_ours, out_ref, atol=1e-11)

    def test_forward_f32_semantics(self, ehf, torch, data):
        # Reference as shipped: f32 params, f64 M-transform truncated into
        # the f32 AtXt buffer.
        ref = ehf.EmbeddingGCN(
            data["At_torch"],
            data["X_torch"],
            data["edges_torch"],
            data["M_torch"],
            hidden_feat=[4, 2],
            condensed_W=True,
            use_Minv=False,
        )
        out_ref = _t2n(ref())
        assert out_ref.dtype == np.float32

        from tmgcn_tpu.models.tmgcn import TMGCN

        model = TMGCN(
            n_slices=T, in_feat=F0, hidden_feat=(4, 2), dtype=jnp.float32
        )
        variables = {
            "params": {"W": jnp.asarray(_t2n(ref.W)), "U": jnp.asarray(_t2n(ref.U))},
            "buffers": {},
        }
        out_ours = np.asarray(model.apply(variables, *_ours_args(data)))
        assert out_ours.dtype == np.float32
        np.testing.assert_allclose(out_ours, out_ref, rtol=1e-5, atol=1e-4)

    def test_backward_strict_f64(self, ehf, torch, data):
        with default_dtype(torch, torch.float64):
            ref = ehf.EmbeddingGCN(
                data["At_torch"],
                data["X_torch"],
                data["edges_torch"],
                data["M_torch"],
                hidden_feat=[4, 2],
                condensed_W=True,
                use_Minv=False,
            )
            target = torch.tensor(np.arange(E) % 2, dtype=torch.long)
            cw = torch.tensor([0.8, 0.2], dtype=torch.float64)
            loss = torch.nn.CrossEntropyLoss(weight=cw)(ref(), target)
            loss.backward()

        from tmgcn_tpu.models.tmgcn import TMGCN
        from tmgcn_tpu.train.losses import weighted_cross_entropy

        model = TMGCN(n_slices=T, in_feat=F0, hidden_feat=(4, 2), dtype=jnp.float64)
        params0 = {"W": jnp.asarray(_t2n(ref.W)), "U": jnp.asarray(_t2n(ref.U))}

        def loss_ours(params):
            out = model.apply({"params": params, "buffers": {}}, *_ours_args(data))
            return weighted_cross_entropy(
                out, jnp.asarray(np.arange(E) % 2), jnp.asarray(np.array([0.8, 0.2]))
            )

        grads = jax.grad(loss_ours)(params0)
        np.testing.assert_allclose(np.asarray(grads["W"]), _t2n(ref.W.grad), atol=1e-12)
        np.testing.assert_allclose(np.asarray(grads["U"]), _t2n(ref.U.grad), atol=1e-12)


class TestTMGCN2Layer:
    @pytest.mark.parametrize(
        "nonlin,twice,thrice",
        [("selu", False, False), ("relu", True, False), ("leaky", True, True)],
    )
    def test_forward_strict_f64(self, ehf, torch, data, nonlin, twice, thrice):
        with default_dtype(torch, torch.float64):
            ref = ehf.EmbeddingGCN2(
                data["At_torch"],
                data["X_torch"],
                data["edges_torch"],
                data["M_torch"],
                hidden_feat=[4, 3, 2],
                condensed_W=True,
                use_Minv=False,
                apply_M_twice=twice,
                apply_M_three_times=thrice,
                nonlin2=nonlin,
            )
            out_ref = _t2n(ref())

        from tmgcn_tpu.models.tmgcn import TMGCN2

        model = TMGCN2(
            n_slices=T,
            in_feat=F0,
            hidden_feat=(4, 3, 2),
            apply_M_twice=twice,
            apply_M_three_times=thrice,
            nonlin2=nonlin,
            dtype=jnp.float64,
            interlayer_dtype=jnp.float64,
        )
        variables = {
            "params": {
                "W1": jnp.asarray(_t2n(ref.W1)),
                "W2": jnp.asarray(_t2n(ref.W2)),
                "U": jnp.asarray(_t2n(ref.U)),
            },
            "buffers": {},
        }
        out_ours = np.asarray(model.apply(variables, *_ours_args(data)))
        np.testing.assert_allclose(out_ours, out_ref, atol=1e-11)

    def test_forward_f32_semantics(self, ehf, torch, data):
        ref = ehf.EmbeddingGCN2(
            data["At_torch"],
            data["X_torch"],
            data["edges_torch"],
            data["M_torch"],
            hidden_feat=[4, 3, 2],
            condensed_W=True,
            use_Minv=False,
            nonlin2="selu",
        )
        out_ref = _t2n(ref())

        from tmgcn_tpu.models.tmgcn import TMGCN2

        model = TMGCN2(
            n_slices=T,
            in_feat=F0,
            hidden_feat=(4, 3, 2),
            nonlin2="selu",
            dtype=jnp.float32,
            interlayer_dtype=jnp.float64,
        )
        variables = {
            "params": {
                "W1": jnp.asarray(_t2n(ref.W1)),
                "W2": jnp.asarray(_t2n(ref.W2)),
                "U": jnp.asarray(_t2n(ref.U)),
            },
            "buffers": {},
        }
        out_ours = np.asarray(model.apply(variables, *_ours_args(data)))
        np.testing.assert_allclose(out_ours, out_ref, rtol=1e-5, atol=1e-4)


class TestKWGCN:
    @pytest.mark.parametrize("layers", [1, 2])
    def test_forward_strict_f64(self, ehf, torch, data, layers):
        hidden = [4, 2] if layers == 1 else [4, 3, 2]
        with default_dtype(torch, torch.float64):
            ref = ehf.EmbeddingKWGCN(
                data["At_torch"],
                data["X_torch"],
                data["edges_torch"],
                hidden_feat=hidden,
                nonlin2="selu",
            )
            out_ref = _t2n(ref())

        from tmgcn_tpu.models.gcn import KWGCN

        model = KWGCN(
            n_slices=T,
            in_feat=F0,
            hidden_feat=tuple(hidden),
            nonlin2="selu",
            dtype=jnp.float64,
            interlayer_dtype=jnp.float64,
        )
        params = {"W1": jnp.asarray(_t2n(ref.W1)), "U": jnp.asarray(_t2n(ref.U))}
        if layers == 2:
            params["W2"] = jnp.asarray(_t2n(ref.W2))
        out_ours = np.asarray(
            model.apply(
                {"params": params, "buffers": {}},
                data["A"],
                jnp.asarray(data["X"]),
                jnp.asarray(data["edges"]),
            )
        )
        np.testing.assert_allclose(out_ours, out_ref, atol=1e-11)


class TestEvolveGCN:
    def test_one_layer_strict_f64(self, torch, data):
        ef = load_reference_module("evolvegcn_functions")
        with default_dtype(torch, torch.float64):
            ref = ef.EvolveGCN_1_layer(
                data["At_torch"], data["X_torch"], data["edges_torch"], hidden_feat=[2, 2]
            )
            out_ref, W_ref = ref()

        from tmgcn_tpu.models.evolvegcn import EvolveGCN

        model = EvolveGCN(n_slices=T, in_feat=F0, hidden_feat=(2, 2), dtype=jnp.float64)
        cell = {"p": jnp.asarray(_t2n(ref.p))}
        for g in ["Z", "R", "H"]:
            cell[f"W_{g}"] = jnp.asarray(_t2n(getattr(ref, f"W_{g}")))
            cell[f"U_{g}"] = jnp.asarray(_t2n(getattr(ref, f"U_{g}")))
            cell[f"B_{g}"] = jnp.asarray(_t2n(getattr(ref, f"B_{g}")))
        variables = {
            "params": {"cell1": cell, "U": jnp.asarray(_t2n(ref.U))},
            "buffers": {"W_init1": jnp.asarray(_t2n(ref.W_init))},
        }
        out_ours, (W_ours,) = model.apply(
            variables, data["A"], jnp.asarray(data["X"]), jnp.asarray(data["edges"])
        )
        np.testing.assert_allclose(np.asarray(out_ours), _t2n(out_ref), atol=1e-11)
        np.testing.assert_allclose(np.asarray(W_ours), _t2n(W_ref), atol=1e-11)

    def test_two_layer_strict_f64(self, torch, data):
        ef = load_reference_module("evolvegcn_functions")
        with default_dtype(torch, torch.float64):
            ref = ef.EvolveGCN_2_layer(
                data["At_torch"], data["X_torch"], data["edges_torch"],
                hidden_feat=[2, 2, 2],
            )
            out_ref, W_ref, W2_ref = ref()

        from tmgcn_tpu.models.evolvegcn import EvolveGCN

        model = EvolveGCN(
            n_slices=T, in_feat=F0, hidden_feat=(2, 2, 2), dtype=jnp.float64
        )
        variables = {
            "params": {"U": jnp.asarray(_t2n(ref.U))},
            "buffers": {
                "W_init1": jnp.asarray(_t2n(ref.W_init)),
                "W_init2": jnp.asarray(_t2n(ref.W_init2)),
            },
        }
        for layer, suffix in [(1, ""), (2, "2")]:
            cell = {"p": jnp.asarray(_t2n(getattr(ref, f"p{suffix}")))}
            for g in ["Z", "R", "H"]:
                cell[f"W_{g}"] = jnp.asarray(_t2n(getattr(ref, f"W_{g}{suffix}")))
                cell[f"U_{g}"] = jnp.asarray(_t2n(getattr(ref, f"U_{g}{suffix}")))
                cell[f"B_{g}"] = jnp.asarray(_t2n(getattr(ref, f"B_{g}{suffix}")))
            variables["params"][f"cell{layer}"] = cell
        out_ours, (W_ours, W2_ours) = model.apply(
            variables, data["A"], jnp.asarray(data["X"]), jnp.asarray(data["edges"])
        )
        np.testing.assert_allclose(np.asarray(out_ours), _t2n(out_ref), atol=1e-11)
        np.testing.assert_allclose(np.asarray(W_ours), _t2n(W_ref), atol=1e-11)
        np.testing.assert_allclose(np.asarray(W2_ours), _t2n(W2_ref), atol=1e-11)


class TestWDGCN:
    def test_forward_strict_f64(self, torch, data):
        wgf = load_reference_module("wd_gcn_functions")
        with default_dtype(torch, torch.float64):
            ref = wgf.WD_GCN(
                data["At_torch"], data["X_torch"], data["edges_torch"], hidden_feat=[3, 2]
            )
            out_ref = _t2n(ref())

        from tmgcn_tpu.models.wdgcn import WDGCN

        model = WDGCN(n_slices=T, in_feat=F0, hidden_feat=(3, 2), dtype=jnp.float64)
        lstm = {}
        for g in "fjco":
            lstm[f"W{g}"] = jnp.asarray(_t2n(getattr(ref, f"W{g}")))
            lstm[f"U{g}"] = jnp.asarray(_t2n(getattr(ref, f"U{g}")))
            lstm[f"b{g}"] = jnp.asarray(_t2n(getattr(ref, f"b{g}")))
        variables = {
            "params": {"W": jnp.asarray(_t2n(ref.W)), "lstm": lstm},
            "buffers": {
                "U": jnp.asarray(_t2n(ref.U)),
                "h_init": jnp.asarray(_t2n(ref.h_init)),
                "c_init": jnp.asarray(_t2n(ref.c_init)),
            },
        }
        out_ours = np.asarray(
            model.apply(
                variables, data["A"], jnp.asarray(data["X"]), jnp.asarray(data["edges"])
            )
        )
        np.testing.assert_allclose(out_ours, out_ref, atol=1e-11)


class TestSupportFunctions:
    def test_compute_f1(self, ehf, torch):
        rng = np.random.default_rng(1)
        guess = rng.integers(0, 2, 200)
        target = rng.integers(0, 2, 200)
        p_ref, r_ref, f_ref = ehf.compute_f1(torch.tensor(guess), torch.tensor(target))
        from tmgcn_tpu.tasks.metrics import precision_recall_f1

        p, r, f = precision_recall_f1(guess, target)
        assert p == pytest.approx(float(p_ref), abs=1e-12)
        assert r == pytest.approx(float(r_ref), abs=1e-12)
        assert f == pytest.approx(float(f_ref), abs=1e-12)

    def test_compute_map_mrr(self, ehf, torch):
        rng = np.random.default_rng(2)
        Em = 300
        logits = rng.standard_normal((Em, 2))
        target = rng.integers(0, 2, Em)
        edges = np.stack(
            [np.sort(rng.integers(0, 4, Em)), rng.integers(0, 15, Em),
             rng.integers(0, 15, Em)]
        )
        MAP_ref, MRR_ref = ehf.compute_MAP_MRR(
            torch.tensor(logits), torch.tensor(target), torch.tensor(edges)
        )
        from tmgcn_tpu.tasks.metrics import map_mrr

        MAP, MRR = map_mrr(logits, target, edges)
        assert MAP == pytest.approx(float(MAP_ref), abs=1e-10)
        assert MRR == pytest.approx(float(MRR_ref), abs=1e-10)

    def test_split_data(self, ehf, torch):
        rng = np.random.default_rng(3)
        Em = 400
        S_train, S_val, S_test = 8, 2, 2
        edges_aug = np.stack(
            [np.sort(rng.integers(0, 12, Em)), rng.integers(0, 20, Em),
             rng.integers(0, 20, Em)]
        )
        labels = rng.integers(0, 2, Em)
        ref = ehf.split_data(
            torch.tensor(edges_aug), torch.tensor(labels), S_train, S_val, S_test, True
        )
        (e_tr_ref, t_tr_ref, m_tr_ref, e_v_ref, t_v_ref, m_v_ref, K_v_ref,
         e_te_ref, t_te_ref, m_te_ref, K_te_ref) = ref

        from tmgcn_tpu.tasks.windows import WindowSpec, split_data_link_prediction

        spec = WindowSpec(S_train, S_val, S_test, same_block_size=True)
        splits = split_data_link_prediction(edges_aug, labels, spec)
        np.testing.assert_array_equal(splits["train"].edges, _t2n(e_tr_ref))
        np.testing.assert_array_equal(splits["train"].target, _t2n(t_tr_ref))
        np.testing.assert_array_equal(splits["train"].model_edges, _t2n(m_tr_ref))
        np.testing.assert_array_equal(splits["val"].edges, _t2n(e_v_ref))
        np.testing.assert_array_equal(splits["val"].model_edges, _t2n(m_v_ref))
        assert splits["val"].n_eval_tail == int(K_v_ref)
        np.testing.assert_array_equal(splits["test"].edges, _t2n(e_te_ref))
        assert splits["test"].n_eval_tail == int(K_te_ref)

    def test_create_node_features(self, ehf, torch, data):
        # total == T so the reference's open-tail test window matches our
        # closed width-S_train window (true of every real config).
        S_train, S_val, S_test = 4, 1, 1
        dense = data["dense"]
        idx = np.stack(np.nonzero(dense))
        A_torch = torch.sparse_coo_tensor(
            torch.tensor(idx, dtype=torch.long),
            torch.tensor(dense[tuple(idx)]),
            (T, N, N),
        ).coalesce()
        X_tr_ref, X_v_ref, X_te_ref = ehf.create_node_features(
            A_torch, S_train, S_val, S_test, True
        )

        from tmgcn_tpu.ops.degree import degree_features_np
        from tmgcn_tpu.tasks.windows import WindowSpec, window_features

        X = degree_features_np(data["A"])
        spec = WindowSpec(S_train, S_val, S_test, same_block_size=True)
        feats = window_features(X, spec)
        # The reference routes degree features through a float32 buffer
        # (t.zeros default dtype, embedding_help_functions.py:598) before
        # the .double() cast; our host-side prep keeps full precision, so
        # agreement is to f32 resolution.
        np.testing.assert_allclose(feats["train"], _t2n(X_tr_ref), rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(feats["val"], _t2n(X_v_ref), rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(feats["test"], _t2n(X_te_ref), rtol=1e-6, atol=1e-6)
