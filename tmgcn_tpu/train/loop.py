"""Task training loops: full-batch SGD with periodic evaluation.

Reproduces the reference experiment-driver protocol (capability
reference: TensorGCN-master/experiment_bitcoin_our.py:100-173 for edge
classification, experiment_bitcoin_our_link_prediction.py:82-139 for
link prediction, test_graph_SEIR.py:149-200 for regression): full-batch
SGD (lr 0.01, momentum 0.9), evaluation of val/test every ``eval_every``
epochs, and per-epoch metric rows in the reference's exact array layouts
(epochs x 12 for F1 mode, epochs x 9 for MAP-MRR mode) so result pickles
are directly comparable.

TPU-first structure: epochs between evaluations run as ONE device call —
a ``lax.scan`` over SGD steps inside jit — rather than one dispatch per
epoch (host<->device latency would otherwise dominate: a full-batch
epoch of these models is sub-millisecond on-chip). Per-epoch scalars
(loss, confusion counts) come back as stacked arrays from the scan.
Evaluation epochs run as a single step so the fresh training logits are
available, mirroring the reference's cadence exactly.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tmgcn_tpu.tasks import metrics as M
from tmgcn_tpu.tasks.adapters import ModelAdapter
from tmgcn_tpu.tasks.windows import EdgeSplit, LinkPredSplit
from tmgcn_tpu.train.losses import summed_per_slice_mse, weighted_cross_entropy


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    n_epochs: int = 100
    lr: float = 0.01
    momentum: float = 0.9
    eval_every: int = 100
    verbose: bool = False
    optimizer: str = "sgd"  # "sgd" (reference) | "adam"
    grad_clip: float | None = None  # global-norm clip (None = off)


def _optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    if cfg.optimizer == "adam":
        opt = optax.adam(cfg.lr)
    elif cfg.optimizer == "sgd":
        opt = optax.sgd(cfg.lr, momentum=cfg.momentum)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    if cfg.grad_clip is not None:
        opt = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), opt)
    return opt


def _f1(tp: float, fp: float, fn: float) -> tuple[float, float, float]:
    with np.errstate(invalid="ignore", divide="ignore"):
        p = float(np.float64(tp) / (tp + fp))
        r = float(np.float64(tp) / (tp + fn))
        f1 = float(2 * np.float64(p) * r / (p + r))
    return p, r, f1


def _confusion(out: jax.Array, tgt: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    guess = jnp.argmax(out, axis=1)
    tp = jnp.sum((guess == 0) & (tgt == 0))
    fp = jnp.sum((guess == 0) & (tgt != 0))
    fn = jnp.sum((guess != 0) & (tgt == 0))
    return tp, fp, fn


def _make_steps(
    adapter: ModelAdapter,
    buffers: dict,
    opt,
    cw,
    with_confusion: bool,
    logit_transform=None,
):
    """Build (single_step, chunk_step) jitted training functions."""

    def sgd_step(params, opt_state, bundle, tgt):
        def loss_fn(p):
            # HIGHEST matmul precision: the TPU MXU's default bf16 input
            # passes inject enough noise into these small, ill-conditioned
            # full-batch problems (raw degree features, SGD+momentum) that
            # training orbits chaotically instead of converging to the
            # reference's fixed point (observed: reddit LP val MAP
            # oscillating 0.04-0.30 on TPU vs clean convergence on CPU).
            # The model matmuls are tiny, so the f32 passes cost nothing.
            with jax.default_matmul_precision("highest"):
                out, carry = adapter.apply({"params": p, "buffers": buffers}, bundle, ())
            if logit_transform is not None:
                out = logit_transform(out)
            return weighted_cross_entropy(out, tgt, cw), (out, carry)

        (loss, (out, carry)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, out, carry

    @jax.jit
    def single_step(params, opt_state, bundle, tgt):
        params, opt_state, loss, out, carry = sgd_step(params, opt_state, bundle, tgt)
        aux = _confusion(out, tgt) if with_confusion else ()
        return params, opt_state, loss, out, carry, aux

    use_stats = getattr(adapter, "train_stats", None) is not None

    def sgd_step_stats(params, opt_state, bundle, tgt):
        """Collective-light step: loss/confusion from SHARDED logits."""

        def loss_fn(p):
            # Same HIGHEST-precision contract as sgd_step (see the note
            # there): without it the 99-in-100 chunk epochs would
            # reintroduce the bf16 MXU noise on TPU.
            with jax.default_matmul_precision("highest"):
                loss, aux = adapter.train_stats(
                    {"params": p, "buffers": buffers}, bundle, tgt, cw,
                    logit_transform,
                )
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    @partial(jax.jit, static_argnames="n_steps")
    def chunk_step(params, opt_state, bundle, tgt, n_steps):
        def body(carry, _):
            params, opt_state = carry
            if use_stats:
                params, opt_state, loss, aux = sgd_step_stats(
                    params, opt_state, bundle, tgt
                )
                if not with_confusion:
                    aux = ()
            else:
                params, opt_state, loss, out, _ = sgd_step(
                    params, opt_state, bundle, tgt
                )
                aux = _confusion(out, tgt) if with_confusion else ()
            return (params, opt_state), (loss, aux)

        (params, opt_state), (losses, auxs) = jax.lax.scan(
            body, (params, opt_state), None, length=n_steps
        )
        return params, opt_state, losses, auxs

    @jax.jit
    def eval_forward(params, bundle, carry):
        with jax.default_matmul_precision("highest"):
            return adapter.apply({"params": params, "buffers": buffers}, bundle, carry)

    return single_step, chunk_step, eval_forward


def run_edge_classification(
    adapter: ModelAdapter,
    splits: dict[str, EdgeSplit],
    class_weights: np.ndarray,
    cfg: TrainConfig,
    key: jax.Array | None = None,
    variables: dict | None = None,
    checkpointer=None,
) -> tuple[np.ndarray, dict]:
    """Train an edge classifier; returns ((epochs, 12) metrics, variables)."""
    if variables is None:
        variables = adapter.init(key if key is not None else jax.random.PRNGKey(0))
    params, buffers = variables["params"], variables["buffers"]
    cw = jnp.asarray(class_weights, dtype=jnp.result_type(float))
    tgt_train = jnp.asarray(splits["train"].target)

    opt = _optimizer(cfg)
    opt_state = opt.init(params)
    single_step, chunk_step, eval_forward = _make_steps(
        adapter, buffers, opt, cw, with_confusion=True
    )

    results = np.zeros((cfg.n_epochs, 12))
    val_stats = (0.0,) * 4
    test_stats = (0.0,) * 4
    ep = 0
    if checkpointer is not None and checkpointer.latest_epoch() is not None:
        step, restored = checkpointer.restore(
            {"params": params, "opt_state": opt_state, "results": results,
             "buffers": buffers}
        )
        params, opt_state = restored["params"], restored["opt_state"]
        results[: step + 1] = restored["results"][: step + 1]
        val_stats = tuple(results[step, 4:8])
        test_stats = tuple(results[step, 8:12])
        ep = step + 1
    while ep < cfg.n_epochs:
        # Evaluation epoch: one step, then score val/test.
        params, opt_state, loss, _, carry, (tp, fp, fn) = single_step(
            params, opt_state, adapter.bundles["train"], tgt_train
        )
        p_tr, r_tr, f1_tr = _f1(float(tp), float(fp), float(fn))
        stats = {}
        for wname in ("val", "test"):
            out, carry = eval_forward(params, adapter.bundles[wname], carry)
            s = splits[wname]
            out_np = np.asarray(out)[s.eval_mask]
            tgt_np = s.target[s.eval_mask]
            p, r, f1 = M.precision_recall_f1(np.argmax(out_np, axis=1), tgt_np)
            l = M.weighted_ce_loss_np(out_np, tgt_np, np.asarray(class_weights))
            stats[wname] = (p, r, f1, l)
        val_stats, test_stats = stats["val"], stats["test"]
        results[ep] = [p_tr, r_tr, f1_tr, float(loss), *val_stats, *test_stats]
        if cfg.verbose:
            print(
                f"ep {ep}: train f1 {f1_tr:.4f} loss {float(loss):.4f} | "
                f"val f1 {val_stats[2]:.4f} | test f1 {test_stats[2]:.4f}"
            )
        if checkpointer is not None:
            checkpointer.save(ep, params, opt_state, results, buffers=buffers)
        ep += 1

        # Non-evaluation epochs: one fused device call.
        k = min(cfg.eval_every - 1, cfg.n_epochs - ep)
        if k > 0:
            params, opt_state, losses, (tps, fps, fns) = chunk_step(
                params, opt_state, adapter.bundles["train"], tgt_train, k
            )
            losses = np.asarray(losses)
            tps, fps, fns = np.asarray(tps), np.asarray(fps), np.asarray(fns)
            for i in range(k):
                p_tr, r_tr, f1_tr = _f1(float(tps[i]), float(fps[i]), float(fns[i]))
                results[ep + i] = [p_tr, r_tr, f1_tr, losses[i], *val_stats, *test_stats]
            ep += k

    return results, {"params": params, "buffers": buffers}


def run_link_prediction(
    adapter: ModelAdapter,
    splits: dict[str, LinkPredSplit],
    class_weights: np.ndarray,
    cfg: TrainConfig,
    key: jax.Array | None = None,
    variables: dict | None = None,
    checkpointer=None,
    loss_type: str = "softmax",
    eval_type: str = "MAP-MRR",
) -> tuple[np.ndarray, dict]:
    """Train a link predictor; returns ((epochs, K) metrics, variables).

    eval_type="MAP-MRR" (default): (epochs, 9) rows [MAP_tr, MRR_tr,
    loss_tr, MAP_v, MRR_v, loss_v, MAP_te, MRR_te, loss_te];
    eval_type="F1": the (epochs, 12) classification layout.
    loss_type="sigmoid" expects 1-column model outputs and trains on
    [p, 1-p] pairs (reference loss_type option,
    experiment_bitcoin_our_link_prediction.py:195-197).
    """
    if variables is None:
        variables = adapter.init(key if key is not None else jax.random.PRNGKey(0))
    params, buffers = variables["params"], variables["buffers"]
    cw = jnp.asarray(class_weights, dtype=jnp.result_type(float))

    def model_target(s: LinkPredSplit) -> np.ndarray:
        return s.target[s.edges[0] != 0]

    tgt_train = jnp.asarray(model_target(splits["train"]))

    transform = None
    if loss_type == "sigmoid":
        from tmgcn_tpu.train.losses import sigmoid_pair_logits

        transform = sigmoid_pair_logits
    elif loss_type != "softmax":
        raise ValueError(f"unknown loss_type {loss_type!r}")
    if eval_type not in ("MAP-MRR", "F1"):
        raise ValueError(f"unknown eval_type {eval_type!r}")
    use_f1 = eval_type == "F1"

    opt = _optimizer(cfg)
    opt_state = opt.init(params)
    single_step, chunk_step, eval_forward = _make_steps(
        adapter, buffers, opt, cw, with_confusion=False, logit_transform=transform
    )

    def _pairs(out_np):
        if transform is None:
            return out_np
        p = 1.0 / (1.0 + np.exp(-out_np.astype(np.float64)))
        return np.concatenate([p, 1.0 - p], axis=1)

    width = 12 if use_f1 else 9
    results = np.zeros((cfg.n_epochs, width))
    n_stats = 4 if use_f1 else 3
    val_stats = (0.0,) * n_stats
    test_stats = (0.0,) * n_stats
    ep = 0
    if checkpointer is not None and checkpointer.latest_epoch() is not None:
        step, restored = checkpointer.restore(
            {"params": params, "opt_state": opt_state, "results": results,
             "buffers": buffers}
        )
        params, opt_state = restored["params"], restored["opt_state"]
        results[: step + 1] = restored["results"][: step + 1]
        val_stats = tuple(results[step, width - 2 * n_stats : width - n_stats])
        test_stats = tuple(results[step, width - n_stats :])
        ep = step + 1
    while ep < cfg.n_epochs:
        params, opt_state, loss, out_train, carry, _ = single_step(
            params, opt_state, adapter.bundles["train"], tgt_train
        )
        s = splits["train"]
        keep = s.edges[0] != 0
        out_tr = _pairs(np.asarray(out_train))
        if use_f1:
            tr_stats = (*M.precision_recall_f1(np.argmax(out_tr, 1), s.target[keep]),)
        else:
            tr_stats = M.map_mrr(out_tr, s.target[keep], s.edges[:, keep])
        stats = {}
        for wname in ("val", "test"):
            out, carry = eval_forward(params, adapter.bundles[wname], carry)
            s = splits[wname]
            if s.n_eval_tail is not None:
                # Same-block windows: score only the new tail slices.
                K = s.n_eval_tail
                out_np = _pairs(np.asarray(out))[-K:]
                tgt_np = s.target[-K:]
                metric_edges = s.edges[:, -K:]
            else:
                # Disjoint windows: score every model edge.
                keep = s.edges[0] != 0
                out_np = _pairs(np.asarray(out))
                tgt_np = s.target[keep]
                metric_edges = s.edges[:, keep]
            l = M.weighted_ce_loss_np(out_np, tgt_np, np.asarray(class_weights))
            if use_f1:
                stats[wname] = (*M.precision_recall_f1(np.argmax(out_np, 1), tgt_np), l)
            else:
                stats[wname] = (*M.map_mrr(out_np, tgt_np, metric_edges), l)
        val_stats, test_stats = stats["val"], stats["test"]
        results[ep] = [*tr_stats, float(loss), *val_stats, *test_stats]
        if cfg.verbose:
            print(
                f"ep {ep}: train {tr_stats} loss {float(loss):.4f} | "
                f"val {val_stats[0]:.4f} | test {test_stats[0]:.4f}"
            )
        if checkpointer is not None:
            checkpointer.save(ep, params, opt_state, results, buffers=buffers)
        ep += 1

        k = min(cfg.eval_every - 1, cfg.n_epochs - ep)
        if k > 0:
            params, opt_state, losses, _ = chunk_step(
                params, opt_state, adapter.bundles["train"], tgt_train, k
            )
            losses = np.asarray(losses)
            for i in range(k):
                results[ep + i] = [*tr_stats, losses[i], *val_stats, *test_stats]
            ep += k

    return results, {"params": params, "buffers": buffers}


def run_regression(
    adapter: ModelAdapter,
    targets: dict[str, np.ndarray],
    cfg: TrainConfig,
    key: jax.Array | None = None,
    variables: dict | None = None,
    checkpointer=None,
) -> tuple[dict, dict]:
    """Train a node regressor; returns (result dict, variables).

    Result: per-epoch training losses plus final val/test L1 and
    L1-ratio, matching the SEIR protocol. With a checkpointer, state is
    saved after each chunk of epochs and training resumes from the
    latest checkpoint (same contract as the cls/LP loops).
    """
    if variables is None:
        variables = adapter.init(key if key is not None else jax.random.PRNGKey(0))
    params, buffers = variables["params"], variables["buffers"]
    y_train = jnp.asarray(targets["train"])

    opt = _optimizer(cfg)
    opt_state = opt.init(params)

    @partial(jax.jit, static_argnames="n_steps")
    def chunk_step(params, opt_state, bundle, yt, n_steps):
        def body(carry, _):
            params, opt_state = carry

            def loss_fn(p):
                # HIGHEST precision: see the matching note in _make_steps.
                with jax.default_matmul_precision("highest"):
                    out, _ = adapter.apply({"params": p, "buffers": buffers}, bundle, ())
                return summed_per_slice_mse(out, yt)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), None, length=n_steps
        )
        return params, opt_state, losses

    @jax.jit
    def eval_forward(params, bundle):
        with jax.default_matmul_precision("highest"):
            out, _ = adapter.apply({"params": params, "buffers": buffers}, bundle, ())
        return out

    losses = np.zeros(cfg.n_epochs)
    chunk = max(1, cfg.eval_every)
    ep = 0
    if checkpointer is not None and checkpointer.latest_epoch() is not None:
        step, restored = checkpointer.restore(
            {"params": params, "opt_state": opt_state, "results": losses,
             "buffers": buffers}
        )
        params, opt_state = restored["params"], restored["opt_state"]
        losses[: step + 1] = restored["results"][: step + 1]
        ep = step + 1
    while ep < cfg.n_epochs:
        k = min(chunk, cfg.n_epochs - ep)
        params, opt_state, ls = chunk_step(
            params, opt_state, adapter.bundles["train"], y_train, k
        )
        losses[ep : ep + k] = np.asarray(ls)
        if cfg.verbose:
            print(f"ep {ep + k - 1}: train mse {losses[ep + k - 1]:.5f}")
        ep += k
        if checkpointer is not None:
            checkpointer.save(ep - 1, params, opt_state, losses, buffers=buffers)

    result = {"train_loss": losses}
    for wname in ("val", "test"):
        out = np.asarray(eval_forward(params, adapter.bundles[wname]))
        l1, ratio = M.l1_and_ratio(out, targets[wname])
        result[f"{wname}_l1"] = l1
        result[f"{wname}_l1_ratio"] = ratio
    return result, {"params": params, "buffers": buffers}
