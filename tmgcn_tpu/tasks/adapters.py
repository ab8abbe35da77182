"""Model-family adapters: one calling convention across architectures.

Each model family has a different forward signature (TM-GCN takes M,
KWGCN doesn't, EvolveGCN returns evolved weights that must be threaded
train -> val -> test as the reference does in
experiment_bitcoin_evolvegcn.py:132-148). Adapters close over the
prepared window data and expose:

    init(key) -> variables
    logits(variables, window, carry) -> (logits, new_carry)

so the task runners in ``tmgcn_tpu.train.loop`` are model-agnostic.
``carry`` is () for stateless families and the tuple of evolved weight
matrices for EvolveGCN.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from tmgcn_tpu.core.sparse import TemporalCOO
from tmgcn_tpu.models.evolvegcn import EvolveGCN, EvolveGCNReg
from tmgcn_tpu.models.gcn import KWGCN
from tmgcn_tpu.models.tmgcn import TMGCN, TMGCN2, TMGCNReg
from tmgcn_tpu.models.wdgcn import WDGCN, WDGCNReg

WINDOWS = ("train", "val", "test")


@dataclasses.dataclass
class EdgeModelAdapter:
    """Uniform (variables, window, carry) -> (logits, carry) interface."""

    init: Callable[[jax.Array], dict]
    _logits: Callable[..., Any]
    initial_carry: Callable[[dict], Any]

    def logits(self, variables: dict, window: str, carry: Any = ()) -> tuple[jax.Array, Any]:
        return self._logits(variables, window, carry)


def _as_edges_array(edges: np.ndarray) -> jax.Array:
    return jnp.asarray(np.asarray(edges), dtype=jnp.int32)


def make_edge_adapter(
    model,
    adj: dict[str, TemporalCOO],
    feats: dict[str, jax.Array],
    edges: dict[str, np.ndarray],
    M: np.ndarray | None = None,
    drop_last_slice: bool = False,
) -> EdgeModelAdapter:
    """Build the adapter for an edge-output model on prepared windows.

    Args:
        model: a TMGCN/TMGCN2/KWGCN/EvolveGCN instance.
        adj: per-window adjacency (Ct for TM-GCN, C for baselines).
        feats: per-window (T, N, F) features.
        edges: per-window (3, E) model-input edges.
        M: mixing matrix (TM-GCN families only).
        drop_last_slice: link-prediction convention — model consumes
            slices [0, T-1) and M[:-1, :-1].
    """
    prepared_adj = {}
    prepared_X = {}
    prepared_edges = {w: jax.device_put(_as_edges_array(edges[w])) for w in WINDOWS}
    for w in WINDOWS:
        A, X = adj[w], feats[w]
        if drop_last_slice:
            A = A.slice_window(0, A.n_slices - 1)
            X = np.asarray(X)[:-1]
        # One up-front transfer per window; everything downstream is jitted.
        prepared_adj[w] = jax.device_put(A)
        prepared_X[w] = jax.device_put(jnp.asarray(X))

    if M is not None:
        Mj = np.asarray(M)
        if drop_last_slice:
            Mj = Mj[:-1, :-1]
        Mj = jnp.asarray(Mj, dtype=prepared_X["train"].dtype)

    if isinstance(model, (TMGCN, TMGCN2)):

        def logits(variables, window, carry):
            out = model.apply(
                variables, prepared_adj[window], prepared_X[window], prepared_edges[window], Mj
            )
            return out, carry

        return EdgeModelAdapter(model.init, logits, lambda variables: ())

    if isinstance(model, KWGCN):

        def logits(variables, window, carry):
            out = model.apply(
                variables, prepared_adj[window], prepared_X[window], prepared_edges[window]
            )
            return out, carry

        return EdgeModelAdapter(model.init, logits, lambda variables: ())

    if isinstance(model, EvolveGCN):

        def logits(variables, window, carry):
            inits = carry if carry else (None, None)[: max(1, model.n_layers)]
            out, finals = model.apply(
                variables,
                prepared_adj[window],
                prepared_X[window],
                prepared_edges[window],
                *inits,
            )
            return out, finals

        def initial_carry(variables):
            b = variables["buffers"]
            if model.n_layers == 2:
                return (b["W_init1"], b["W_init2"])
            return (b["W_init1"],)

        return EdgeModelAdapter(model.init, logits, initial_carry)

    if isinstance(model, WDGCN):

        def logits(variables, window, carry):
            out = model.apply(
                variables, prepared_adj[window], prepared_X[window], prepared_edges[window]
            )
            return out, carry

        return EdgeModelAdapter(model.init, logits, lambda variables: ())

    raise TypeError(f"unsupported edge model: {type(model).__name__}")


def make_regression_adapter(
    model,
    adj: dict[str, TemporalCOO],
    feats: dict[str, jax.Array],
    M: np.ndarray | None = None,
) -> EdgeModelAdapter:
    """Adapter for (T, N) regression models (SEIR task)."""
    prepared_X = {w: jax.device_put(jnp.asarray(feats[w])) for w in WINDOWS}
    adj = {w: jax.device_put(adj[w]) for w in WINDOWS}
    if M is not None:
        Mj = jnp.asarray(np.asarray(M), dtype=prepared_X["train"].dtype)

    if isinstance(model, TMGCNReg):

        def logits(variables, window, carry):
            return model.apply(variables, adj[window], prepared_X[window], Mj), carry

        return EdgeModelAdapter(model.init, logits, lambda variables: ())

    if isinstance(model, EvolveGCNReg):

        def logits(variables, window, carry):
            W0 = carry[0] if carry else None
            # Regression forward matches the reference: evolved weights are
            # threaded implicitly from buffers; explicit carry supported.
            return model.apply(variables, adj[window], prepared_X[window], W0), carry

        return EdgeModelAdapter(model.init, logits, lambda variables: ())

    if isinstance(model, WDGCNReg):

        def logits(variables, window, carry):
            return model.apply(variables, adj[window], prepared_X[window]), carry

        return EdgeModelAdapter(model.init, logits, lambda variables: ())

    raise TypeError(f"unsupported regression model: {type(model).__name__}")
