"""Loss functions matching the reference training objectives.

Capability reference: weighted ``nn.CrossEntropyLoss`` in every
classification/link-prediction driver (e.g. TensorGCN-master/
experiment_bitcoin_our.py:113) — weighted mean: Σ w[y_i]·ce_i / Σ w[y_i];
the per-slice-summed MSE of the SEIR regression drivers
(test_graph_SEIR.py:135-140); and the sigmoid loss_type of the
link-prediction drivers (unused by default configs but supported).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def weighted_cross_entropy(
    logits: jax.Array,
    targets: jax.Array,
    class_weights: jax.Array,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Torch-semantics weighted CE with mean reduction.

    The per-row label lookups are one-hot contractions, not
    ``take_along_axis``: on TPU the row-gather lowers to a form ~20x
    slower than the whole rest of a 1-layer training epoch (measured
    12.2 -> 0.67 ms/epoch at E=772k, C=2), while the one-hot product is
    a fusible elementwise op over the tiny class axis.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(targets, logits.shape[-1], dtype=logits.dtype)
    nll = -jnp.sum(logp * onehot, axis=-1)
    w = onehot @ class_weights.astype(logits.dtype)
    if mask is not None:
        w = w * mask.astype(logits.dtype)
    return jnp.sum(w * nll) / jnp.sum(w)


def sigmoid_pair_logits(out: jax.Array) -> jax.Array:
    """loss_type='sigmoid': map (E, 1) outputs to (E, 2) as [p, 1-p]."""
    p = jax.nn.sigmoid(out)
    return jnp.concatenate([p, 1.0 - p], axis=1)


def summed_per_slice_mse(pred: jax.Array, truth: jax.Array) -> jax.Array:
    """Σ over slices of mean-squared-error within the slice -> scalar."""
    per_slice = jnp.mean((pred - truth) ** 2, axis=tuple(range(1, pred.ndim)))
    return jnp.sum(per_slice)
