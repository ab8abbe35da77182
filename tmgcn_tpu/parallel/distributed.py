"""Multi-host initialization.

Single-host multi-chip needs nothing (jax.devices() sees all local
chips). For multi-host pod slices, call :func:`initialize` once at
program start on every host; afterwards ``jax.devices()`` is global and
the (graph x time) mesh in ``tmgcn_tpu.parallel.mesh`` spans hosts —
shard_map collectives ride ICI within a slice and DCN across slices
exactly as XLA lays them out.

The per-window data each host feeds (``shard_batch``) must be the full
global arrays; jax.Array's per-device addressing hands every host its
shards. Checkpointing (train/checkpoint.py, Orbax) is multi-host-safe:
all hosts participate in save/restore.
"""

from __future__ import annotations

import jax


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed (no-op when already initialized or
    running single-process).

    On TPU pods with standard orchestration (GKE/TPU VM metadata) all
    arguments are auto-detected; pass them explicitly otherwise.
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        # Single-process run (no coordinator configured): nothing to do.
        pass


def runtime_info() -> dict:
    """Process/device topology summary for logs."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
        "platform": jax.devices()[0].platform,
    }
