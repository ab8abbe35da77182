"""Task training loops: full-batch SGD with periodic evaluation.

Reproduces the reference experiment-driver protocol (capability
reference: TensorGCN-master/experiment_bitcoin_our.py:100-173 for edge
classification, experiment_bitcoin_our_link_prediction.py:82-139 for
link prediction, test_graph_SEIR.py:149-200 for regression): full-batch
SGD (lr 0.01, momentum 0.9), evaluation of val/test every ``eval_every``
epochs, and per-epoch metric rows in the reference's exact array layouts
(epochs x 12 for F1 mode, epochs x 9 for MAP-MRR mode) so result pickles
are directly comparable.

The training step is one jitted function (forward + backward + update
fused by XLA); evaluation forwards are jitted per window and the metric
arithmetic runs host-side in float64 with numerics identical to the
reference (see tmgcn_tpu.tasks.metrics).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tmgcn_tpu.tasks import metrics as M
from tmgcn_tpu.tasks.adapters import EdgeModelAdapter
from tmgcn_tpu.tasks.windows import EdgeSplit, LinkPredSplit
from tmgcn_tpu.train.losses import summed_per_slice_mse, weighted_cross_entropy


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    n_epochs: int = 100
    lr: float = 0.01
    momentum: float = 0.9
    eval_every: int = 100
    verbose: bool = False


def _optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.sgd(cfg.lr, momentum=cfg.momentum)


def _f1_from_guess(guess: np.ndarray, target: np.ndarray) -> tuple[float, float, float]:
    return M.precision_recall_f1(guess, target)


def run_edge_classification(
    adapter: EdgeModelAdapter,
    splits: dict[str, EdgeSplit],
    class_weights: np.ndarray,
    cfg: TrainConfig,
    key: jax.Array | None = None,
    variables: dict | None = None,
) -> tuple[np.ndarray, dict]:
    """Train an edge classifier; returns ((epochs, 12) metrics, variables)."""
    if variables is None:
        variables = adapter.init(key if key is not None else jax.random.PRNGKey(0))
    params, buffers = variables["params"], variables["buffers"]
    cw = jnp.asarray(class_weights, dtype=jnp.result_type(float))
    targets = {w: jnp.asarray(s.target) for w, s in splits.items()}

    opt = _optimizer(cfg)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state):
        def loss_fn(p):
            out, carry = adapter.logits({"params": p, "buffers": buffers}, "train", ())
            return weighted_cross_entropy(out, targets["train"], cw), (out, carry)

        (loss, (out, carry)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        # In-graph confusion counts: the host fetches 3 scalars per epoch
        # instead of the full (E, C) logits.
        guess = jnp.argmax(out, axis=1)
        tgt = targets["train"]
        tp = jnp.sum((guess == 0) & (tgt == 0))
        fp = jnp.sum((guess == 0) & (tgt != 0))
        fn = jnp.sum((guess != 0) & (tgt == 0))
        return optax.apply_updates(params, updates), opt_state, loss, (tp, fp, fn), carry

    @partial(jax.jit, static_argnames="window")
    def eval_forward(params, window, carry):
        return adapter.logits({"params": params, "buffers": buffers}, window, carry)

    results = np.zeros((cfg.n_epochs, 12))
    val_stats = (0.0,) * 4
    test_stats = (0.0,) * 4
    for ep in range(cfg.n_epochs):
        params, opt_state, loss, (tp, fp, fn), carry = train_step(params, opt_state)
        tp, fp, fn = float(tp), float(fp), float(fn)
        with np.errstate(invalid="ignore", divide="ignore"):
            p_tr = float(np.float64(tp) / (tp + fp))
            r_tr = float(np.float64(tp) / (tp + fn))
            f1_tr = 2 * p_tr * r_tr / (p_tr + r_tr) if (p_tr + r_tr) > 0 else float("nan")

        if ep % cfg.eval_every == 0:
            stats = {}
            for wname in ("val", "test"):
                out, carry = eval_forward(params, wname, carry)
                s = splits[wname]
                out_np = np.asarray(out)[s.eval_mask]
                tgt_np = s.target[s.eval_mask]
                p, r, f1 = _f1_from_guess(np.argmax(out_np, axis=1), tgt_np)
                l = M.weighted_ce_loss_np(out_np, tgt_np, np.asarray(class_weights))
                stats[wname] = (p, r, f1, l)
            val_stats, test_stats = stats["val"], stats["test"]
            if cfg.verbose:
                print(
                    f"ep {ep}: train f1 {f1_tr:.4f} loss {float(loss):.4f} | "
                    f"val f1 {val_stats[2]:.4f} | test f1 {test_stats[2]:.4f}"
                )
        results[ep] = [p_tr, r_tr, f1_tr, float(loss), *val_stats, *test_stats]

    return results, {"params": params, "buffers": buffers}


def run_link_prediction(
    adapter: EdgeModelAdapter,
    splits: dict[str, LinkPredSplit],
    class_weights: np.ndarray,
    cfg: TrainConfig,
    key: jax.Array | None = None,
    variables: dict | None = None,
) -> tuple[np.ndarray, dict]:
    """Train a link predictor; returns ((epochs, 9) metrics, variables).

    Row layout: [MAP_tr, MRR_tr, loss_tr, MAP_v, MRR_v, loss_v,
    MAP_te, MRR_te, loss_te]; MAP/MRR refresh every eval_every epochs.
    """
    if variables is None:
        variables = adapter.init(key if key is not None else jax.random.PRNGKey(0))
    params, buffers = variables["params"], variables["buffers"]
    cw = jnp.asarray(class_weights, dtype=jnp.result_type(float))

    # Model-input targets: labels of edges with slice > 0 (shifted inputs).
    def model_target(s: LinkPredSplit) -> np.ndarray:
        return s.target[s.edges[0] != 0]

    tgt_train = jnp.asarray(model_target(splits["train"]))

    opt = _optimizer(cfg)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state):
        def loss_fn(p):
            out, carry = adapter.logits({"params": p, "buffers": buffers}, "train", ())
            return weighted_cross_entropy(out, tgt_train, cw), (out, carry)

        (loss, (out, carry)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, out, carry

    @partial(jax.jit, static_argnames="window")
    def eval_forward(params, window, carry):
        return adapter.logits({"params": params, "buffers": buffers}, window, carry)

    results = np.zeros((cfg.n_epochs, 9))
    map_tr = mrr_tr = 0.0
    val_stats = (0.0, 0.0, 0.0)
    test_stats = (0.0, 0.0, 0.0)
    for ep in range(cfg.n_epochs):
        params, opt_state, loss, out_train, carry = train_step(params, opt_state)

        if ep % cfg.eval_every == 0:
            s = splits["train"]
            keep = s.edges[0] != 0
            map_tr, mrr_tr = M.map_mrr(
                np.asarray(out_train), s.target[keep], s.edges[:, keep]
            )
            stats = {}
            for wname in ("val", "test"):
                out, carry = eval_forward(params, wname, carry)
                s = splits[wname]
                K = s.n_eval_tail if s.n_eval_tail is not None else len(s.target)
                out_np = np.asarray(out)[-K:]
                tgt_np = s.target[-K:]
                mp, mr = M.map_mrr(out_np, tgt_np, s.edges[:, -K:])
                l = M.weighted_ce_loss_np(out_np, tgt_np, np.asarray(class_weights))
                stats[wname] = (mp, mr, l)
            val_stats, test_stats = stats["val"], stats["test"]
            if cfg.verbose:
                print(
                    f"ep {ep}: train MAP/MRR {map_tr:.4f}/{mrr_tr:.4f} "
                    f"loss {float(loss):.4f} | val MAP {val_stats[0]:.4f} | "
                    f"test MAP {test_stats[0]:.4f}"
                )
        results[ep] = [map_tr, mrr_tr, float(loss), *val_stats, *test_stats]

    return results, {"params": params, "buffers": buffers}


def run_regression(
    adapter: EdgeModelAdapter,
    targets: dict[str, np.ndarray],
    cfg: TrainConfig,
    key: jax.Array | None = None,
    variables: dict | None = None,
) -> tuple[dict, dict]:
    """Train a node regressor; returns (result dict, variables).

    Result: per-epoch training losses plus final val/test L1 and
    L1-ratio, matching the SEIR protocol.
    """
    if variables is None:
        variables = adapter.init(key if key is not None else jax.random.PRNGKey(0))
    params, buffers = variables["params"], variables["buffers"]
    y = {w: jnp.asarray(t) for w, t in targets.items()}

    opt = _optimizer(cfg)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state):
        def loss_fn(p):
            out, _ = adapter.logits({"params": p, "buffers": buffers}, "train", ())
            return summed_per_slice_mse(out, y["train"])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = np.zeros(cfg.n_epochs)
    for ep in range(cfg.n_epochs):
        params, opt_state, loss = train_step(params, opt_state)
        losses[ep] = float(loss)
        if cfg.verbose and ep % 10 == 0:
            print(f"ep {ep}: train mse {losses[ep]:.5f}")

    @partial(jax.jit, static_argnames="window")
    def eval_forward(params, window):
        out, _ = adapter.logits({"params": params, "buffers": buffers}, window, ())
        return out

    result = {"train_loss": losses}
    for wname in ("val", "test"):
        out = np.asarray(eval_forward(params, wname))
        l1, ratio = M.l1_and_ratio(out, targets[wname])
        result[f"{wname}_l1"] = l1
        result[f"{wname}_l1_ratio"] = ratio
    return result, {"params": params, "buffers": buffers}
