"""Banded-M halo exchange across the time axis.

TM-GCN's M-transform mixes each slice with its ``band-1`` predecessors
(banded lower-triangular M — SURVEY.md §5 "long-context"). When the time
axis is sharded, a shard therefore needs only the previous shard's last
``band-1`` slices — a single neighbor ``ppermute`` of (band-1, N, F)
instead of an all-gather of (T, N, F): traffic shrinks by T/band (4x for
the canonical 80-slice/20-band configs at 2-way time sharding, more at
higher shardings).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tmgcn_tpu.parallel.mesh import TIME_AXIS


def halo_exchange_backward(x_loc: jax.Array, halo: int, axis_name: str = TIME_AXIS):
    """Receive the previous ``halo`` time slices from predecessor shards.

    Returns (halo, ...) slices ordered oldest-first. When the halo spans
    more than one shard window (band-1 > T_loc — e.g. the canonical
    band-20/T=80 config at 8-way time sharding), the exchange runs one
    ``ppermute`` per predecessor hop: hop j moves the tail of shard i to
    shard i+j. Shards with fewer than j predecessors receive zeros
    (banded causal M has no wraparound — nothing precedes t=0).
    """
    if halo <= 0:
        return x_loc[:0]  # diagonal M: no neighbor slices needed
    T_loc = x_loc.shape[0]
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    n_hops = -(-halo // T_loc)  # ceil
    parts = []
    for j in range(n_hops, 0, -1):
        # Hop j supplies the slice range [t0 - j*T_loc, t0 - (j-1)*T_loc)
        # clipped to the halo: the sender's tail of width w.
        w = min(T_loc, halo - (j - 1) * T_loc)
        send = x_loc[-w:]
        recv = jax.lax.ppermute(
            send, axis_name, perm=[(i, (i + j) % n) for i in range(n)]
        )
        parts.append(jnp.where(idx < j, jnp.zeros_like(recv), recv))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def local_banded_m(M: np.ndarray, n_time: int, halo: int) -> np.ndarray:
    """Precompute per-shard banded M blocks: (n_time, T_loc, T_loc + halo).

    Shard i's block maps its extended input window [t0 - halo, t0 + T_loc)
    to its local output slices [t0, t0 + T_loc); columns reaching before
    t=0 are zero (matching the causal band).
    """
    M = np.asarray(M)
    T = M.shape[0]
    if T % n_time:
        raise ValueError(f"T={T} not divisible by n_time={n_time}")
    T_loc = T // n_time
    # halo > T_loc is fine: halo_exchange_backward runs one ppermute hop
    # per predecessor shard window the band reaches into.
    M_pad = np.concatenate([np.zeros((T, halo)), M], axis=1)  # (T, halo + T)
    blocks = np.zeros((n_time, T_loc, T_loc + halo))
    for i in range(n_time):
        t0 = i * T_loc
        blocks[i] = M_pad[t0 : t0 + T_loc, t0 : t0 + T_loc + halo]
    return blocks


def banded_m_transform_local(
    x_loc: jax.Array, m_block: jax.Array, halo: int, axis_name: str = TIME_AXIS
) -> jax.Array:
    """Sharded M ×₁ X: halo exchange + local banded block matmul.

    Args:
        x_loc: (T_loc, N, F) this shard's feature slices.
        m_block: (T_loc, T_loc + halo) this shard's rows of M over its
            extended input window (see local_banded_m).
    Returns:
        (T_loc, N, F) this shard's slices of M ×₁ X.
    """
    h = halo_exchange_backward(x_loc, halo, axis_name)
    ext = jnp.concatenate([h, x_loc], axis=0)  # (T_loc + halo, N, F)
    return jnp.einsum("st,tnf->snf", m_block.astype(ext.dtype), ext)
