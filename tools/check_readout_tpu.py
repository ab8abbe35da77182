"""On-chip correctness check for the sparse-window readout backward.

The all_windows=False + donated-zero-init path relies on Pallas
input_output_aliases semantics: windows never visited by the grid must
retain the init's zeros in the output buffer. The interpret-mode test
(tests/test_pallas_spmm.py) proves the logic; THIS check proves the
Mosaic lowering on the real chip — run it at tunnel-up before trusting
any training that used the new plan.

    python tools/check_readout_tpu.py
"""

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from tmgcn_tpu.ops.edge_readout import (
        apply_readout,
        edge_readout,
        make_readout_plan,
    )

    assert jax.default_backend() == "tpu", "run on the real chip"
    rng = np.random.default_rng(0)
    # Chess-like sparsity: few targets over a large (T*N) table, so
    # MOST windows are unvisited — the aliasing property under test.
    T, N, F, C, E = 80, 7301, 6, 3, 3000
    edges = np.stack([
        rng.integers(0, T, E), rng.integers(0, N, E), rng.integers(0, N, E)
    ])
    plan = make_readout_plan(edges, T, N)
    Y = jnp.asarray(rng.standard_normal((T, N, F)).astype(np.float32))
    U = jnp.asarray(rng.standard_normal((2 * F, C)).astype(np.float32))

    out_fast = apply_readout(plan, Y, U)
    out_ref = edge_readout(Y, jnp.asarray(edges), U)
    np.testing.assert_allclose(
        np.asarray(out_fast), np.asarray(out_ref), atol=1e-4
    )

    g_fast = jax.jit(jax.grad(lambda y: (apply_readout(plan, y, U) ** 2).sum()))(Y)
    g_ref = jax.jit(jax.grad(lambda y: (edge_readout(y, jnp.asarray(edges), U) ** 2).sum()))(Y)
    diff = float(jnp.abs(g_fast - g_ref).max())
    # Zero rows must be EXACT zeros (untouched windows keep the init).
    touched = np.zeros(T * N, bool)
    touched[np.asarray(plan.src)] = True
    touched[np.asarray(plan.trg)] = True
    untouched_max = float(
        jnp.abs(g_fast.reshape(T * N, F)[~touched]).max()
    )
    print(f"grad max|diff| = {diff:.2e}; untouched rows max = {untouched_max:.2e}")
    assert diff < 1e-3, diff
    assert untouched_max == 0.0, "aliased init rows were corrupted"
    print("sparse-window readout backward OK on TPU")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
