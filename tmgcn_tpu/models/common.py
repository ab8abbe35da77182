"""Shared model utilities: initializers, nonlinearities, variable trees.

Models in this framework are plain functional modules: a config dataclass
with ``init(key) -> variables`` and ``apply(variables, ...) -> output``.
``variables`` is ``{"params": ..., "buffers": ...}``; optimizers update
only ``params`` — ``buffers`` carries the reference's deliberately
non-learned tensors (EvolveGCN's W_init, WD-GCN's frozen readout U,
LSTM initial states) so parity runs reproduce them exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def randn(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """Standard-normal init, matching the reference's ``t.randn``."""
    return jax.random.normal(key, shape, dtype=dtype)


def nonlinearity(name: str):
    """The interlayer nonlinearity family of the reference (nonlin2)."""
    if name == "relu":
        return jax.nn.relu
    if name == "leaky":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.01)
    if name == "selu":
        return jax.nn.selu
    raise ValueError(f"unknown nonlinearity: {name!r}")


def split_dict(key: jax.Array, names: list[str]) -> dict[str, jax.Array]:
    keys = jax.random.split(key, len(names))
    return dict(zip(names, keys))
