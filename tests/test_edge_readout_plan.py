"""Fast-backward ReadoutPlan: forward and gradient parity (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from tmgcn_tpu.ops.edge_readout import (
    apply_readout,
    edge_readout,
    make_readout_plan,
)


def _setup(seed=0, T=4, N=64, E=120, F=5):
    rng = np.random.default_rng(seed)
    edges = np.stack([
        np.sort(rng.integers(0, T, E)),
        rng.integers(0, N, E),
        rng.integers(0, N, E),
    ]).astype(np.int64)
    Y = jnp.asarray(rng.standard_normal((T, N, F)).astype(np.float32))
    U = jnp.asarray(rng.standard_normal((2 * F, 3)).astype(np.float32))
    plan = make_readout_plan(edges, T, N, interpret=True)
    return edges, Y, U, plan


def test_plan_forward_matches_direct():
    edges, Y, U, plan = _setup()
    direct = edge_readout(Y, jnp.asarray(edges), U)
    fast = apply_readout(plan, Y, U)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(direct), rtol=1e-6, atol=1e-6)


def test_plan_gradients_match_direct():
    edges, Y, U, plan = _setup(seed=1)
    e = jnp.asarray(edges)
    tgt = jnp.asarray(np.random.default_rng(2).standard_normal((edges.shape[1], 3)).astype(np.float32))

    def loss_direct(Y, U):
        return jnp.sum((edge_readout(Y, e, U) - tgt) ** 2)

    def loss_fast(Y, U):
        return jnp.sum((apply_readout(plan, Y, U) - tgt) ** 2)

    gY_d, gU_d = jax.grad(loss_direct, argnums=(0, 1))(Y, U)
    gY_f, gU_f = jax.grad(loss_fast, argnums=(0, 1))(Y, U)
    np.testing.assert_allclose(np.asarray(gY_f), np.asarray(gY_d), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gU_f), np.asarray(gU_d), rtol=1e-5, atol=1e-5)


def test_evolvegcn_adapter_fast_path_matches_model():
    """The gather-free 1-layer adapter logits == model.apply logits."""
    from tmgcn_tpu.core.sparse import TemporalCOO
    from tmgcn_tpu.models.evolvegcn import EvolveGCN
    from tmgcn_tpu.tasks.adapters import make_edge_adapter

    rng = np.random.default_rng(7)
    T, N, per, E, F0 = 5, 80, 150, 60, 3
    A = TemporalCOO(
        rows=np.sort(rng.integers(0, N, (T, per)), axis=1).astype(np.int32),
        cols=rng.integers(0, N, (T, per)).astype(np.int32),
        vals=rng.standard_normal((T, per)).astype(np.float32),
        nnz=np.full(T, per, np.int32),
        n_nodes=N,
    )
    X = rng.standard_normal((T, N, F0)).astype(np.float32)
    edges = {
        w: np.stack([
            np.sort(rng.integers(0, T, E)),
            rng.integers(0, N, E),
            rng.integers(0, N, E),
        ]).astype(np.int64)
        for w in ("train", "val", "test")
    }
    model = EvolveGCN(n_slices=T, in_feat=F0, hidden_feat=(4, 3))
    adapter = make_edge_adapter(
        model,
        {w: A for w in ("train", "val", "test")},
        {w: X for w in ("train", "val", "test")},
        edges,
    )
    assert "ax_srcT" in adapter.bundles["train"]  # fast path engaged
    variables = adapter.init(jax.random.PRNGKey(1))
    out_fast, (W_fin_fast,) = adapter.logits(variables, "train")
    AX = model.propagate(A, jnp.asarray(X))
    out_ref, (W_fin_ref,) = model.apply(
        variables, A, jnp.asarray(X), jnp.asarray(edges["train"]), AX=AX
    )
    np.testing.assert_allclose(
        np.asarray(out_fast), np.asarray(out_ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(W_fin_fast), np.asarray(W_fin_ref), rtol=1e-6, atol=1e-6
    )
    # explicit initial weights thread through the carry identically
    W0 = jnp.asarray(rng.standard_normal((F0, 4)).astype(np.float32))
    out_fast2, _ = adapter.apply(variables, adapter.bundles["val"], (W0,))
    out_ref2, _ = model.apply(
        variables, A, jnp.asarray(X), jnp.asarray(edges["val"]), W0, AX=AX
    )
    np.testing.assert_allclose(
        np.asarray(out_fast2), np.asarray(out_ref2), rtol=1e-5, atol=1e-5
    )
    # parameter gradients agree too (the training path)
    tgt = jnp.asarray(rng.standard_normal((E, 3)).astype(np.float32))

    def loss_fast(p):
        out, _ = adapter.apply(
            {"params": p, "buffers": variables["buffers"]},
            adapter.bundles["train"], (),
        )
        return jnp.sum((out - tgt) ** 2)

    def loss_ref(p):
        out, _ = model.apply(
            {"params": p, "buffers": variables["buffers"]},
            A, jnp.asarray(X), jnp.asarray(edges["train"]), AX=AX,
        )
        return jnp.sum((out - tgt) ** 2)

    g_fast = jax.grad(loss_fast)(variables["params"])
    g_ref = jax.grad(loss_ref)(variables["params"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4
        ),
        g_fast, g_ref,
    )


def test_evolvegcn_readout_op_matches_direct():
    from tmgcn_tpu.core.sparse import TemporalCOO
    from tmgcn_tpu.models.evolvegcn import EvolveGCN
    from tmgcn_tpu.ops.edge_readout import apply_readout as ar

    rng = np.random.default_rng(3)
    T, N, per, E, F0 = 4, 64, 100, 50, 3
    A = TemporalCOO(
        rows=np.sort(rng.integers(0, N, (T, per)), axis=1).astype(np.int32),
        cols=rng.integers(0, N, (T, per)).astype(np.int32),
        vals=rng.standard_normal((T, per)).astype(np.float32),
        nnz=np.full(T, per, np.int32),
        n_nodes=N,
    )
    X = jnp.asarray(rng.standard_normal((T, N, F0)).astype(np.float32))
    edges = np.stack([
        np.sort(rng.integers(0, T, E)), rng.integers(0, N, E), rng.integers(0, N, E)
    ]).astype(np.int64)
    model = EvolveGCN(n_slices=T, in_feat=F0, hidden_feat=(4, 3))
    variables = model.init(jax.random.PRNGKey(0))
    AX = model.propagate(A, X)
    plan = make_readout_plan(edges, T, N, interpret=True)
    e = jnp.asarray(edges)
    out_direct, _ = model.apply(variables, A, X, e, AX=AX)
    out_plan, _ = model.apply(
        variables, A, X, e, AX=AX, readout_op=lambda Y, U: ar(plan, Y, U)
    )
    np.testing.assert_allclose(
        np.asarray(out_plan), np.asarray(out_direct), rtol=1e-5, atol=1e-5
    )


def test_evolvegcn2_adapter_restricted_matches_model():
    """The readout-restricted 2-layer adapter == generic staged model.

    The restricted path replaces the full-row per-epoch layer-2 SpMM
    (A ⊛ H1) with a rectangular endpoint-rows operator and applies the
    per-slice evolved weights through one-hot matmuls; identical math to
    the staged model.apply (which itself matches the reference scan,
    evolvegcn_functions.py:104-213).
    """
    from tmgcn_tpu.core.sparse import TemporalCOO
    from tmgcn_tpu.models.evolvegcn import EvolveGCN
    from tmgcn_tpu.tasks.adapters import make_edge_adapter

    rng = np.random.default_rng(11)
    T, N, per, E, F0 = 5, 80, 150, 60, 3
    A = TemporalCOO(
        rows=np.sort(rng.integers(0, N, (T, per)), axis=1).astype(np.int32),
        cols=rng.integers(0, N, (T, per)).astype(np.int32),
        vals=rng.standard_normal((T, per)).astype(np.float32),
        nnz=np.full(T, per, np.int32),
        n_nodes=N,
    )
    X = rng.standard_normal((T, N, F0)).astype(np.float32)
    edges = {
        w: np.stack([
            np.sort(rng.integers(0, T, E)),
            rng.integers(0, N, E),
            rng.integers(0, N, E),
        ]).astype(np.int64)
        for w in ("train", "val", "test")
    }
    model = EvolveGCN(n_slices=T, in_feat=F0, hidden_feat=(4, 4, 3))
    adapter = make_edge_adapter(
        model,
        {w: A for w in ("train", "val", "test")},
        {w: X for w in ("train", "val", "test")},
        edges,
    )
    assert "l2op" in adapter.bundles["train"]  # restricted path engaged
    variables = adapter.init(jax.random.PRNGKey(1))
    out_fast, (Wf_fast, W2f_fast) = adapter.logits(variables, "train")
    AX = model.propagate(A, jnp.asarray(X))
    out_ref, (Wf_ref, W2f_ref) = model.apply(
        variables, A, jnp.asarray(X), jnp.asarray(edges["train"]), AX=AX
    )
    np.testing.assert_allclose(
        np.asarray(out_fast), np.asarray(out_ref), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(Wf_fast), np.asarray(Wf_ref), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(W2f_fast), np.asarray(W2f_ref), rtol=1e-6, atol=1e-6
    )
    # explicit initial weights (the eval carry) thread identically
    W0 = jnp.asarray(rng.standard_normal((F0, 4)).astype(np.float32))
    W20 = jnp.asarray(rng.standard_normal((4, 4)).astype(np.float32))
    out_fast2, _ = adapter.apply(variables, adapter.bundles["val"], (W0, W20))
    out_ref2, _ = model.apply(
        variables, A, jnp.asarray(X), jnp.asarray(edges["val"]), W0, W20, AX=AX
    )
    np.testing.assert_allclose(
        np.asarray(out_fast2), np.asarray(out_ref2), rtol=1e-4, atol=1e-4
    )
    # parameter gradients agree (the training path)
    tgt = jnp.asarray(rng.standard_normal((E, 3)).astype(np.float32))

    def loss_fast(p):
        out, _ = adapter.apply(
            {"params": p, "buffers": variables["buffers"]},
            adapter.bundles["train"], (),
        )
        return jnp.sum((out - tgt) ** 2)

    def loss_ref(p):
        out, _ = model.apply(
            {"params": p, "buffers": variables["buffers"]},
            A, jnp.asarray(X), jnp.asarray(edges["train"]), AX=AX,
        )
        return jnp.sum((out - tgt) ** 2)

    g_fast = jax.grad(loss_fast)(variables["params"])
    g_ref = jax.grad(loss_ref)(variables["params"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4
        ),
        g_fast, g_ref,
    )


def test_lane_major_plan_matches_direct():
    """Forced lane-major backward (the huge-T*N auto path) == direct."""
    rng = np.random.default_rng(5)
    T, N, E, F = 4, 64, 120, 5
    edges = np.stack([
        np.sort(rng.integers(0, T, E)),
        rng.integers(0, N, E),
        rng.integers(0, N, E),
    ]).astype(np.int64)
    Y = jnp.asarray(rng.standard_normal((T, N, F)).astype(np.float32))
    U = jnp.asarray(rng.standard_normal((2 * F, 3)).astype(np.float32))
    plan = make_readout_plan(edges, T, N, interpret=True, lane_major=True)
    assert plan.lane_major
    e = jnp.asarray(edges)
    tgt = jnp.asarray(rng.standard_normal((E, 3)).astype(np.float32))

    np.testing.assert_allclose(
        np.asarray(apply_readout(plan, Y, U)),
        np.asarray(edge_readout(Y, e, U)), rtol=1e-6, atol=1e-6,
    )

    def loss_direct(Y, U):
        return jnp.sum((edge_readout(Y, e, U) - tgt) ** 2)

    def loss_fast(Y, U):
        return jnp.sum((apply_readout(plan, Y, U) - tgt) ** 2)

    gY_d, gU_d = jax.grad(loss_direct, argnums=(0, 1))(Y, U)
    gY_f, gU_f = jax.grad(loss_fast, argnums=(0, 1))(Y, U)
    np.testing.assert_allclose(np.asarray(gY_f), np.asarray(gY_d),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gU_f), np.asarray(gU_d),
                               rtol=1e-5, atol=1e-5)


def test_lane_major_auto_threshold():
    from tmgcn_tpu.ops.edge_readout import LANE_MAJOR_BYTES

    # chess (T*N = 584k) stays on the standard kernel; the 500k-node
    # configs (T*N = 32M) switch automatically.
    assert (584_080 // 8 + 1) * 4096 < LANE_MAJOR_BYTES
    assert (32_000_000 // 8 + 1) * 4096 > LANE_MAJOR_BYTES
