"""Scaling-efficiency harness: sharded training step across mesh sizes.

    python -m tmgcn_tpu.utils.scaling_bench [--devices 8] [--cpu] [--out results/scaling.json]

Measures the (graph x time) sharded TM-GCN training step at increasing
device counts on whatever devices are available, reporting edges/s and
parallel efficiency vs the 1-device run. On a virtual CPU mesh this
validates the methodology and the collective structure; real scaling
numbers require a multi-chip TPU slice (the BASELINE.md target is >=80%
edges/s efficiency at 4 hosts).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def run(max_devices: int | None = None, force_cpu: bool = False) -> list[dict]:
    import jax

    if force_cpu:
        jax.config.update("jax_platform_name", "cpu")
        jax.config.update("jax_num_cpu_devices", max_devices or 8)
    import jax.numpy as jnp
    import optax

    from tmgcn_tpu.core.mmatrix import band_offsets, make_m_matrix
    from tmgcn_tpu.core.sparse import TemporalCOO
    from tmgcn_tpu.parallel.halo import local_banded_m
    from tmgcn_tpu.parallel.mesh import make_mesh
    from tmgcn_tpu.parallel.partition import partition_rows
    from tmgcn_tpu.parallel.tmgcn_sharded import (
        make_sharded_train_step_halo,
        partition_edges_by_time,
        shard_batch,
    )

    n_avail = len(jax.devices())
    max_devices = min(max_devices or n_avail, n_avail)

    # Workload: fixed problem size (strong scaling).
    rng = np.random.default_rng(0)
    T, N, F, E, NNZ = 16, 4096, 32, 100_000, 40_000
    slices = []
    for _ in range(T):
        r = np.sort(rng.integers(0, N, NNZ))
        slices.append((r, rng.integers(0, N, NNZ), rng.random(NNZ)))
    A = TemporalCOO.from_slices(slices, N, dtype=jnp.float32)
    M = make_m_matrix(T, 4).astype(np.float32)
    halo = band_offsets(M)[0]
    X = rng.standard_normal((T, N, F)).astype(np.float32)
    edges = np.stack(
        [rng.integers(0, T, E), rng.integers(0, N, E), rng.integers(0, N, E)]
    ).astype(np.int32)
    targets = rng.integers(0, 2, E).astype(np.int32)
    cw = jnp.asarray(np.array([0.9, 0.1], np.float32))

    configs = []
    d = 1
    while d <= max_devices:
        n_time = 2 if (d % 2 == 0 and halo <= T // 2) else 1
        configs.append((d, d // n_time, n_time))
        d *= 2

    results = []
    base_rate = None
    control_base = None
    for n_dev, n_graph, n_time in configs:
        mesh = make_mesh(n_graph=n_graph, n_time=n_time, devices=jax.devices()[:n_dev])
        A_sh = partition_rows(A, n_graph)
        m_blocks = local_banded_m(M, n_time, halo)
        e_sh, t_sh, m_sh = partition_edges_by_time(edges, targets, T, n_time)
        opt = optax.sgd(1e-4, momentum=0.9)
        step = make_sharded_train_step_halo(mesh, A_sh.n_local_rows, opt, m_blocks, halo)
        params = {
            "W": jnp.asarray(rng.standard_normal((F, 32)).astype(np.float32)),
            "U": jnp.asarray(rng.standard_normal((64, 2)).astype(np.float32)),
        }
        opt_state = opt.init(params)
        batch = shard_batch(mesh, A_sh, jnp.asarray(X), jnp.asarray(M), jnp.asarray(edges), None)
        args = (
            batch["A"], batch["X"], jnp.asarray(e_sh), jnp.asarray(t_sh),
            jnp.asarray(m_sh), cw,
        )
        params, opt_state, loss = step(params, opt_state, *args)  # compile
        _ = float(loss)
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state, loss = step(params, opt_state, *args)
        _ = float(loss)
        dt = (time.perf_counter() - t0) / iters
        rate = E / dt
        if base_rate is None:
            base_rate = rate

        # Control: a zero-communication batched matmul sharded over the
        # same devices (per-device work constant). If THIS fails to
        # scale, the "devices" share hardware (virtual CPU mesh:
        # threads competing for the same cores/bandwidth) and the
        # efficiency column measures the host, not our collectives.
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh_devices = mesh
        ctrl = jnp.asarray(
            rng.standard_normal((n_dev * 4, 512, 512)).astype(np.float32)
        )
        ctrl = jax.device_put(ctrl, NamedSharding(mesh_devices, P(("graph", "time"))))

        @jax.jit
        def ctrl_step(x):
            for _ in range(8):
                x = jnp.tanh(x @ x)
            return x

        # Scalar fetch, not block_until_ready: the latter returns early
        # through the axon tunnel (CLAUDE.md timing rule).
        ctrl_out = ctrl_step(ctrl)
        float(ctrl_out.sum())
        t0 = time.perf_counter()
        for _ in range(10):
            ctrl_out = ctrl_step(ctrl_out)
        float(ctrl_out.sum())
        ctrl_dt = (time.perf_counter() - t0) / 10
        ctrl_rate = n_dev / ctrl_dt  # per-device-work units per second
        if control_base is None:
            control_base = ctrl_rate / n_dev

        results.append(
            {
                "devices": n_dev,
                "mesh": f"{n_graph}x{n_time}",
                "step_ms": round(dt * 1e3, 2),
                "edges_per_s": round(rate),
                "efficiency": round(rate / (base_rate * n_dev), 3),
                "control_no_comm_efficiency": round(
                    ctrl_rate / (control_base * n_dev), 3
                ),
            }
        )
        print(json.dumps(results[-1]))
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None, help="write JSON results here")
    a = ap.parse_args()
    rows = run(a.devices, a.cpu)
    if a.out:
        import pathlib

        import jax

        payload = {
            "backend": jax.default_backend(),
            "workload": "strong scaling: T=16 N=4096 F=32 E=100k nnz=640k",
            "results": rows,
        }
        pathlib.Path(a.out).write_text(json.dumps(payload, indent=1))
