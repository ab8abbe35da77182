"""Model forward passes vs straightforward numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmgcn_tpu.core.mmatrix import make_m_matrix
from tmgcn_tpu.core.sparse import TemporalCOO
from tmgcn_tpu.models.evolvegcn import EvolveGCN, EvolveGCNReg
from tmgcn_tpu.models.gcn import KWGCN
from tmgcn_tpu.models.tmgcn import TMGCN, TMGCN2, TMGCNReg
from tmgcn_tpu.models.wdgcn import WDGCN, WDGCNReg

T, N, F0 = 6, 30, 2
E = 40


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    dense = (rng.random((T, N, N)) < 0.1) * rng.random((T, N, N))
    A = TemporalCOO.from_dense(dense, dtype=jnp.float64, pad_multiple=16)
    X = rng.standard_normal((T, N, F0))
    edges = np.stack(
        [rng.integers(0, T, E), rng.integers(0, N, E), rng.integers(0, N, E)]
    ).astype(np.int32)
    M = make_m_matrix(T, 3)
    return dense, A, X, edges, M


def np_readout(Y, edges, U):
    flat = Y.reshape(-1, Y.shape[-1])
    src = flat[edges[0] * N + edges[1]]
    trg = flat[edges[0] * N + edges[2]]
    return np.concatenate([src, trg], axis=1) @ U


class TestTMGCN:
    def test_forward_oracle(self, data):
        dense, A, X, edges, M = data
        model = TMGCN(n_slices=T, in_feat=F0, hidden_feat=(4, 2), dtype=jnp.float64)
        v = model.init(jax.random.PRNGKey(0))
        out = model.apply(v, A, jnp.asarray(X), jnp.asarray(edges), jnp.asarray(M))

        W = np.asarray(v["params"]["W"])
        U = np.asarray(v["params"]["U"])
        Xt = np.einsum("st,tnf->snf", M, X)
        AtXt = np.einsum("tij,tjf->tif", dense, Xt)
        ref = np_readout(AtXt @ W, edges, U)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-10)

    def test_use_minv(self, data):
        dense, A, X, edges, M = data
        model = TMGCN(
            n_slices=T, in_feat=F0, hidden_feat=(4, 2), use_Minv=True, dtype=jnp.float64
        )
        v = model.init(jax.random.PRNGKey(1))
        out = model.apply(v, A, jnp.asarray(X), jnp.asarray(edges), jnp.asarray(M))
        W = np.asarray(v["params"]["W"])
        U = np.asarray(v["params"]["U"])
        Xt = np.einsum("st,tnf->snf", M, X)
        AtXt = np.einsum("tij,tjf->tif", dense, Xt)
        Y = AtXt @ W
        Y = np.linalg.solve(M, Y.reshape(T, -1)).reshape(Y.shape)
        ref = np_readout(Y, edges, U)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-9)

    def test_per_slice_W(self, data):
        dense, A, X, edges, M = data
        model = TMGCN(
            n_slices=T, in_feat=F0, hidden_feat=(4, 2), condensed_W=False, dtype=jnp.float64
        )
        v = model.init(jax.random.PRNGKey(2))
        assert v["params"]["W"].shape == (T, F0, 4)
        out = model.apply(v, A, jnp.asarray(X), jnp.asarray(edges), jnp.asarray(M))
        assert out.shape == (E, 2)


class TestTMGCN2:
    @pytest.mark.parametrize(
        "twice,thrice", [(False, False), (True, False), (True, True)]
    )
    def test_forward_oracle(self, data, twice, thrice):
        dense, A, X, edges, M = data
        model = TMGCN2(
            n_slices=T,
            in_feat=F0,
            hidden_feat=(4, 3, 2),
            nonlin2="selu",
            apply_M_twice=twice,
            apply_M_three_times=thrice,
            dtype=jnp.float64,
        )
        v = model.init(jax.random.PRNGKey(3))
        out = model.apply(v, A, jnp.asarray(X), jnp.asarray(edges), jnp.asarray(M))

        p = {k: np.asarray(x) for k, x in v["params"].items()}
        Xt = np.einsum("st,tnf->snf", M, X)
        AtXt = np.einsum("tij,tjf->tif", dense, Xt)
        alpha, scale = 1.6732632423543772, 1.0507009873554805
        Y1 = AtXt @ p["W1"]
        Y = scale * np.where(Y1 > 0, Y1, alpha * (np.exp(Y1) - 1))
        if twice:
            Z = np.einsum("tij,tjf->tif", dense, np.einsum("st,tnf->snf", M, Y)) @ p["W2"]
            if thrice:
                Z = np.einsum("st,tnf->snf", M, Z)
        else:
            Z = np.einsum("tij,tjf->tif", dense, Y) @ p["W2"]
        ref = np_readout(Z, edges, p["U"])
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-8)


class TestKWGCN:
    def test_two_layer_oracle(self, data):
        dense, A, X, edges, _ = data
        model = KWGCN(
            n_slices=T, in_feat=F0, hidden_feat=(4, 3, 2), nonlin2="relu", dtype=jnp.float64
        )
        v = model.init(jax.random.PRNGKey(4))
        out = model.apply(v, A, jnp.asarray(X), jnp.asarray(edges))
        p = {k: np.asarray(x) for k, x in v["params"].items()}
        AX = np.einsum("tij,tjf->tif", dense, X)
        Y = np.maximum(AX @ p["W1"], 0)
        Z = np.einsum("tij,tjf->tif", dense, Y) @ p["W2"]
        ref = np_readout(Z, edges, p["U"])
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-9)


def np_summarize(X, p, k):
    y = X @ p / np.linalg.norm(p)
    idx = np.argsort(-y, kind="stable")[:k]
    return X[idx] * y[idx, None]


def np_gru(cell, Xs, H):
    sig = lambda v: 1 / (1 + np.exp(-v))
    Z = sig(cell["W_Z"] @ Xs + cell["U_Z"] @ H + cell["B_Z"])
    R = sig(cell["W_R"] @ Xs + cell["U_R"] @ H + cell["B_R"])
    Ht = np.tanh(cell["W_H"] @ Xs + cell["U_H"] @ (R * H) + cell["B_H"])
    return (1 - Z) * H + Z * Ht


class TestEvolveGCN:
    def test_one_layer_oracle(self, data):
        dense, A, X, edges, _ = data
        model = EvolveGCN(n_slices=T, in_feat=F0, hidden_feat=(2, 2), dtype=jnp.float64)
        v = model.init(jax.random.PRNGKey(5))
        out, (W_fin,) = model.apply(v, A, jnp.asarray(X), jnp.asarray(edges))

        cell = {k: np.asarray(x) for k, x in v["params"]["cell1"].items()}
        U = np.asarray(v["params"]["U"])
        W = np.asarray(v["buffers"]["W_init1"])
        Y = np.zeros((T, N, 2))
        for t in range(T):
            W = np_gru(cell, np_summarize(X[t], cell["p"], W.shape[1]).T, W)
            Y[t] = dense[t] @ X[t] @ W
        ref = np_readout(Y, edges, U)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-9)
        np.testing.assert_allclose(np.asarray(W_fin), W, atol=1e-9)

    def test_two_layer_shapes_and_carry(self, data):
        _, A, X, edges, _ = data
        model = EvolveGCN(n_slices=T, in_feat=F0, hidden_feat=(3, 3, 2), dtype=jnp.float64)
        v = model.init(jax.random.PRNGKey(6))
        out, finals = model.apply(v, A, jnp.asarray(X), jnp.asarray(edges))
        assert out.shape == (E, 2) and len(finals) == 2
        # Threading evolved weights changes the output.
        out2, _ = model.apply(v, A, jnp.asarray(X), jnp.asarray(edges), *finals)
        assert not np.allclose(np.asarray(out), np.asarray(out2))

    def test_reg(self, data):
        _, A, X, _, _ = data
        model = EvolveGCNReg(n_slices=T, in_feat=F0, hidden_feat=(3, 2), dtype=jnp.float64)
        v = model.init(jax.random.PRNGKey(7))
        out = model.apply(v, A, jnp.asarray(X))
        assert out.shape == (T, N)


class TestWDGCN:
    def test_forward_oracle(self, data):
        dense, A, X, edges, _ = data
        model = WDGCN(n_slices=T, in_feat=F0, hidden_feat=(3, 2), dtype=jnp.float64)
        v = model.init(jax.random.PRNGKey(8))
        out = model.apply(v, A, jnp.asarray(X), jnp.asarray(edges))

        p = v["params"]
        lstm = {k: np.asarray(x) for k, x in p["lstm"].items()}
        b = v["buffers"]
        sig = lambda v_: 1 / (1 + np.exp(-v_))
        AX = np.einsum("tij,tjf->tif", dense, X)
        Y = np.maximum(AX @ np.asarray(p["W"]), 0)
        h = np.tile(np.asarray(b["h_init"]), (N, 1))
        c = np.tile(np.asarray(b["c_init"]), (N, 1))
        Z = np.zeros_like(Y)
        for t in range(T):
            f = sig(Y[t] @ lstm["Wf"] + h @ lstm["Uf"] + lstm["bf"])
            j = sig(Y[t] @ lstm["Wj"] + h @ lstm["Uj"] + lstm["bj"])
            o = sig(Y[t] @ lstm["Wo"] + h @ lstm["Uo"] + lstm["bo"])
            ct = sig(Y[t] @ lstm["Wc"] + h @ lstm["Uc"] + lstm["bc"])
            c = j * ct + f * c
            h = o * np.tanh(c)
            Z[t] = h
        ref = np_readout(Z, edges, np.asarray(b["U"]))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-9)

    def test_readout_is_frozen(self, data):
        _, A, X, edges, _ = data
        model = WDGCN(n_slices=T, in_feat=F0, hidden_feat=(3, 2), dtype=jnp.float64)
        v = model.init(jax.random.PRNGKey(9))
        assert "U" in v["buffers"] and "U" not in v["params"]

    def test_reg(self, data):
        _, A, X, _, _ = data
        model = WDGCNReg(n_slices=T, in_feat=F0, hidden_feat=(3, 2), dtype=jnp.float64)
        v = model.init(jax.random.PRNGKey(10))
        assert model.apply(v, A, jnp.asarray(X)).shape == (T, N)


class TestTMGCNReg:
    def test_shapes(self, data):
        _, A, X, _, M = data
        model = TMGCNReg(n_slices=T, in_feat=F0, hidden_feat=(4, 2), dtype=jnp.float64)
        v = model.init(jax.random.PRNGKey(11))
        out = model.apply(v, A, jnp.asarray(X), jnp.asarray(M))
        assert out.shape == (T, N)


class TestEvolveGCNCachedAX:
    @pytest.mark.parametrize("layers", [1, 2])
    def test_cached_matches_uncached(self, data, layers):
        dense, A, X, edges, _ = data
        hidden = (2, 2) if layers == 1 else (2, 2, 2)
        model = EvolveGCN(n_slices=T, in_feat=F0, hidden_feat=hidden, dtype=jnp.float64)
        v = model.init(jax.random.PRNGKey(12))
        Xj = jnp.asarray(X)
        ej = jnp.asarray(edges)
        out_ref, finals_ref = model.apply(v, A, Xj, ej)
        AX = model.propagate(A, Xj)
        out_cached, finals_cached = model.apply(v, A, Xj, ej, AX=AX)
        np.testing.assert_array_equal(np.asarray(out_cached), np.asarray(out_ref))
        for a, b in zip(finals_cached, finals_ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestLstmRemat:
    """The rematerialized in-body LSTM scan == the hoisted-pre scan."""

    def test_fwd_and_grad_match(self):
        import jax
        import jax.numpy as jnp

        from tmgcn_tpu.models.wdgcn import _init_lstm, lstm_scan

        rng = np.random.default_rng(0)
        T, N, F = 7, 33, 5
        params, bufs = _init_lstm(jax.random.PRNGKey(2), F, jnp.float32)
        Y = jnp.asarray(rng.standard_normal((T, N, F)), jnp.float32)

        def run(remat):
            def f(p):
                return jnp.sum(
                    lstm_scan(p, bufs["h_init"], bufs["c_init"], Y,
                              remat=remat) ** 2
                )
            return f(params), jax.grad(f)(params)

        v0, g0 = run(False)
        v1, g1 = run(True)
        np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6)
        for k in g0:
            np.testing.assert_allclose(
                np.asarray(g1[k]), np.asarray(g0[k]), rtol=1e-4, atol=1e-5
            )

    def test_auto_threshold(self):
        from tmgcn_tpu.models.wdgcn import _PRE_BUDGET_ELEMS

        # Small shapes stay on the hoisted path (f64 parity tests depend
        # on it); the budget must be far above every reference dataset.
        assert 80 * 4 * 6 * 7301 < _PRE_BUDGET_ELEMS  # chess
        assert 64 * 4 * 6 * 500_000 > _PRE_BUDGET_ELEMS  # 500k bench
