"""Evaluation metrics with numerics identical to the reference protocol.

Class 0 is the positive/minority class throughout (existing edges for
link prediction, untrustworthy/fraud edges for classification) —
capability reference: IBM/TM-GCN TensorGCN-master/
embedding_help_functions.py — compute_f1 :530-538, get_row_MRR :669-681,
get_MRR :684-701, get_MAP :704-711, compute_MAP_MRR :714-729; SEIR L1 /
L1-ratio protocol test_graph_SEIR.py:172-200.

These run host-side in numpy/float64 on fetched logits (evaluation is
periodic and tiny relative to training); the training loop computes its
in-graph F1 with the same formulas in ``tmgcn_tpu.train``.
"""

from __future__ import annotations

import numpy as np


def precision_recall_f1(guess: np.ndarray, target: np.ndarray) -> tuple[float, float, float]:
    """P/R/F1 with class 0 as the positive class."""
    guess = np.asarray(guess)
    target = np.asarray(target)
    tp = np.float64(np.sum((guess == 0) & (target == 0)))
    fp = np.float64(np.sum((guess == 0) & (target != 0)))
    fn = np.float64(np.sum((guess != 0) & (target == 0)))
    with np.errstate(invalid="ignore", divide="ignore"):
        precision = tp / (tp + fp)
        recall = tp / (tp + fn)
        f1 = 2 * (precision * recall) / (precision + recall)
    return float(precision), float(recall), float(f1)


def average_precision_pos0(scores: np.ndarray, target: np.ndarray) -> float:
    """Average precision with label 0 as positive.

    Matches sklearn's ``average_precision_score(target, scores,
    pos_label=0)``: AP = Σ_n (R_n − R_{n−1}) P_n over descending unique
    score thresholds.
    """
    scores = np.asarray(scores, dtype=np.float64)
    pos = np.asarray(target) == 0
    order = np.argsort(-scores, kind="stable")
    scores_s = scores[order]
    pos_s = pos[order].astype(np.float64)

    tp_cum = np.cumsum(pos_s)
    n_pred = np.arange(1, len(scores_s) + 1, dtype=np.float64)
    # Evaluate at the last index of each tied-score block.
    distinct = np.nonzero(np.diff(scores_s))[0]
    idx = np.concatenate([distinct, [len(scores_s) - 1]])
    precision = tp_cum[idx] / n_pred[idx]
    recall = tp_cum[idx] / max(tp_cum[-1], 1.0)
    recall_prev = np.concatenate([[0.0], recall[:-1]])
    return float(np.sum((recall - recall_prev) * precision))


def row_mrr(probs: np.ndarray, true_classes: np.ndarray) -> float:
    """Mean reciprocal rank of the existing edges within one node's row."""
    existing = np.asarray(true_classes) == 0
    order = np.flip(np.argsort(probs, kind="stable"))
    existing_sorted = existing[order]
    ranks = np.arange(1, len(true_classes) + 1, dtype=np.float64)[existing_sorted]
    return float(np.sum(1.0 / ranks) / ranks.shape[0])


def mrr_from_edges(probs: np.ndarray, true_classes: np.ndarray, adj: np.ndarray) -> float:
    """Slice MRR: average row_mrr over rows that contain a negative edge.

    Mirrors the reference's dense coo->array construction (duplicate
    (i, j) pairs sum) and its row filter ``isin(1, true_matrix[i])``.
    """
    import scipy.sparse as sp

    probs = np.asarray(probs, dtype=np.float64)
    true_classes = np.asarray(true_classes, dtype=np.float64)
    adj = np.asarray(adj)
    shape = (int(adj[0].max()) + 1, int(adj[1].max()) + 1)
    pred = sp.coo_matrix((probs, (adj[0], adj[1])), shape=shape).toarray()
    true = sp.coo_matrix((true_classes, (adj[0], adj[1])), shape=shape).toarray()
    keep = np.nonzero((true == 1).any(axis=1))[0]
    if keep.size == 0:
        return float("nan")
    pred = pred[keep]
    true = true[keep]
    # Vectorized row_mrr with identical ordering/tie semantics:
    # order = flip(argsort(row)) per row, existing = (true == 0).
    order = np.flip(np.argsort(pred, axis=1, kind="stable"), axis=1)
    existing_sorted = np.take_along_axis(true == 0, order, axis=1)
    ranks = np.arange(1, shape[1] + 1, dtype=np.float64)[None, :]
    inv_sum = np.where(existing_sorted, 1.0 / ranks, 0.0).sum(axis=1)
    counts = existing_sorted.sum(axis=1)
    return float(np.mean(inv_sum / counts))


def softmax_pos0(logits: np.ndarray) -> np.ndarray:
    """Probability of class 0 under a softmax over the logit columns."""
    logits = np.asarray(logits, dtype=np.float64)
    z = logits - logits.max(axis=1, keepdims=True)
    e = np.exp(z)
    return e[:, 0] / e.sum(axis=1)


def map_mrr(
    logits: np.ndarray, target: np.ndarray, edges: np.ndarray
) -> tuple[float, float]:
    """Slice-weighted MAP and MRR over a labeled edge set.

    Args:
        logits: (E, C) model outputs.
        target: (E,) labels, 0 = real edge.
        edges: (3, E) [slice, src, trg].
    """
    target = np.asarray(target)
    edges = np.asarray(edges)
    logits = np.asarray(logits, dtype=np.float64)
    probs = softmax_pos0(logits)
    E = len(target)
    MAP = 0.0
    MRR = 0.0
    for k in np.unique(edges[0]):
        m = edges[0] == k
        w = float(np.sum(m)) / E
        MAP += average_precision_pos0(probs[m], target[m]) * w
        # The reference ranks MRR by the RAW class-0 logit, not the
        # softmax probability (compute_MAP_MRR passes do_softmax=False,
        # embedding_help_functions.py:725) — the rankings differ.
        MRR += mrr_from_edges(logits[m, 0], target[m], edges[1:3, m]) * w
    return MAP, MRR


def l1_and_ratio(pred: np.ndarray, truth: np.ndarray) -> tuple[float, float]:
    """SEIR regression eval: per-slice summed L1 and L1/||y||_1, averaged."""
    pred = np.asarray(pred, dtype=np.float64)
    truth = np.asarray(truth, dtype=np.float64)
    T = pred.shape[0]
    loss = 0.0
    ratio = 0.0
    with np.errstate(divide="ignore", invalid="ignore"):
        for ts in range(T):
            l1 = np.float64(np.abs(pred[ts] - truth[ts]).sum())
            loss += l1
            # A slice with ||y||_1 = 0 yields inf, as the reference's
            # division does (test_graph_SEIR.py:179).
            ratio += l1 / np.float64(np.abs(truth[ts]).sum())
    return float(loss / T), float(ratio / T)


def weighted_ce_loss_np(logits: np.ndarray, target: np.ndarray, weights: np.ndarray) -> float:
    """Numpy oracle of torch's weighted CrossEntropyLoss (mean reduction)."""
    logits = np.asarray(logits, dtype=np.float64)
    target = np.asarray(target)
    weights = np.asarray(weights, dtype=np.float64)
    z = logits - logits.max(axis=1, keepdims=True)
    logp = z - np.log(np.exp(z).sum(axis=1, keepdims=True))
    w = weights[target]
    return float(-(w * logp[np.arange(len(target)), target]).sum() / w.sum())
