"""Device mesh construction for graph x time sharding.

The framework's parallelism model (green-field — the reference is
single-process CPU; see SURVEY.md §5 "Distributed communication
backend"): a 2-D logical mesh with axes

  * ``graph`` — node/row partitioning of every slice's adjacency; SpMM
    row blocks are local, boundary features arrive by all-gather (v1)
    or ragged halo exchange (optimized path).
  * ``time``  — temporal slices are embarrassingly parallel in TM-GCN
    (no recurrence); the banded M-transform needs only band-width halo
    slices from time-neighbors.

Works identically on one real chip (1x1), a virtual 8-device CPU mesh
(tests / dry runs), and multi-host pod slices (jax.distributed).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

GRAPH_AXIS = "graph"
TIME_AXIS = "time"


def make_mesh(
    n_graph: int | None = None,
    n_time: int | None = None,
    devices=None,
) -> Mesh:
    """Build a (graph, time) mesh over the available devices.

    Default factorization puts more devices on the graph axis (node
    counts dwarf slice counts in the target workloads).
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_graph is None and n_time is None:
        n_time = 1
        n_graph = n
        # Prefer a 2-D factorization when the device count allows it.
        for t in (2, 4):
            if n % t == 0 and n // t >= t:
                n_time, n_graph = t, n // t
    elif n_graph is None:
        n_graph = n // n_time
    elif n_time is None:
        n_time = n // n_graph
    if n_graph * n_time != n:
        raise ValueError(f"mesh {n_graph}x{n_time} != {n} devices")
    arr = mesh_utils.create_device_mesh((n_graph, n_time), devices=np.asarray(devices))
    return Mesh(arr, (GRAPH_AXIS, TIME_AXIS))


def sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
