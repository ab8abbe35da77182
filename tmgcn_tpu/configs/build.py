"""Experiment assembly: config -> data -> adapter -> training run.

Turns an :class:`ExperimentConfig` into a full run, reproducing the
reference driver semantics per method/task (capability reference — the
driver matrix of IBM/TM-GCN, SURVEY.md §1):

  * tmgcn consumes the M-transformed windows Ct with shifted
    (same-block) windowing; link prediction drops the last slice.
  * gcn/evolvegcn/wdgcn on real datasets consume the untransformed C
    with disjoint windows (both classification and link prediction).
  * SBM and SEIR runs feed every method the transformed Ct windows
    (SBM_EvovleGCN.py:181, graph_SEIR_wd_gcn.py:155).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tmgcn_tpu.core.mmatrix import make_m_matrix
from tmgcn_tpu.core.sparse import TemporalCOO
from tmgcn_tpu.configs.schema import ExperimentConfig
from tmgcn_tpu.models.evolvegcn import EvolveGCN, EvolveGCNReg
from tmgcn_tpu.models.gcn import KWGCN
from tmgcn_tpu.models.tmgcn import TMGCN, TMGCN2, TMGCNReg
from tmgcn_tpu.models.wdgcn import WDGCN, WDGCNReg
from tmgcn_tpu.ops.degree import degree_features_np
from tmgcn_tpu.ops.mtransform import m_transform_coo
from tmgcn_tpu.preprocess import datasets as dsets
from tmgcn_tpu.preprocess.matio import load_artifact, save_artifact
from tmgcn_tpu.preprocess.pipeline import preprocess
from tmgcn_tpu.preprocess.sbm import sbm_temporal_adjacency
from tmgcn_tpu.preprocess.seir import (
    seir_features_targets,
    seir_temporal_adjacency,
    simulate_seir,
)
from tmgcn_tpu.tasks.adapters import make_edge_adapter, make_regression_adapter
from tmgcn_tpu.tasks.sampling import augment_edges
from tmgcn_tpu.tasks.windows import (
    WindowSpec,
    split_data_link_prediction,
    split_edges_classification,
    window_features,
)
from tmgcn_tpu.train.loop import (
    TrainConfig,
    run_edge_classification,
    run_link_prediction,
    run_regression,
)

WINDOWS = ("train", "val", "test")


def _standardize(feats: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Zero-mean/unit-variance per feature, fit on the training window."""
    mu = feats["train"].mean(axis=(0, 1), keepdims=True)
    sd = feats["train"].std(axis=(0, 1), keepdims=True) + 1e-8
    return {w: (x - mu) / sd for w, x in feats.items()}


@dataclasses.dataclass
class ExperimentData:
    """Everything a run needs, prepared host-side."""

    spec: WindowSpec
    adj: dict[str, TemporalCOO]  # per-window adjacency the model consumes
    feats: dict[str, np.ndarray]
    M: np.ndarray | None
    edge_index: np.ndarray | None  # (3, E) labeled edges (cls) or None
    edge_values: np.ndarray | None
    lp_edges: np.ndarray | None  # augmented edges (LP) or None
    lp_labels: np.ndarray | None
    reg_targets: dict[str, np.ndarray] | None


def _disjoint_windows(C: TemporalCOO, spec: WindowSpec) -> dict[str, TemporalCOO]:
    s, v = spec.s_train, spec.s_val
    return {
        "train": C.slice_window(0, s),
        "val": C.slice_window(s, s + v),
        "test": C.slice_window(s + v, spec.total),
    }


def _sbm_window_spec(cfg: ExperimentConfig) -> WindowSpec:
    """35/5/10 at the canonical T=50 (SBM_our.py:38-43), scaled for other T."""
    T = cfg.sbm_n_slices
    s_train = round(0.7 * T)
    s_val = round(0.1 * T)
    return WindowSpec(s_train, s_val, T - s_train - s_val, same_block_size=True)


def _seir_window_spec(cfg: ExperimentConfig) -> WindowSpec:
    """80/10/10 at the canonical T=100 (test_graph_SEIR.py:33), scaled."""
    T = cfg.seir_n_slices
    s_train = round(0.8 * T)
    s_val = round(0.1 * T)
    return WindowSpec(s_train, s_val, T - s_train - s_val, same_block_size=True)


def build_data(
    cfg: ExperimentConfig,
    data_dir: str | Path | None = None,
    artifact: str | Path | None = None,
) -> ExperimentData:
    """Prepare windows/features/edges for a config (host-side)."""
    if cfg.dataset == "sbm":
        spec = _sbm_window_spec(cfg)
        A = sbm_temporal_adjacency(
            cfg.sbm_n_nodes,
            cfg.sbm_n_slices,
            node_change_num=cfg.sbm_node_change,
            seed=cfg.seed,
        )
        M = make_m_matrix(spec.s_train, 20)
        X = degree_features_np(A)
        if cfg.sbm_features == "degree_spectral":
            from tmgcn_tpu.ops.degree import spectral_features_np

            X = np.concatenate([X, spectral_features_np(A, k=2)], axis=-1)
        A_model = A
        if cfg.sbm_normalize:
            from tmgcn_tpu.preprocess.pipeline import normalize_laplacian

            A_model = normalize_laplacian(A)
        windows = {w: A_model.slice_window(*spec.bounds(w)) for w in WINDOWS}
        Ct = {w: m_transform_coo(windows[w], M) for w in WINDOWS}
        edges = A.edge_list()
        aug, labels = augment_edges(
            edges, A.n_nodes, cfg.beta1, cfg.beta2, cfg.cutoff, seed=cfg.seed
        )
        feats = window_features(X, spec)
        if cfg.standardize_features:
            feats = _standardize(feats)
        return ExperimentData(
            spec=spec,
            adj=Ct,
            feats=feats,
            M=M,
            edge_index=None,
            edge_values=None,
            lp_edges=aug,
            lp_labels=labels,
            reg_targets=None,
        )

    if cfg.dataset == "seir":
        spec = _seir_window_spec(cfg)
        data = simulate_seir(
            n_nodes=cfg.seir_n_nodes, n_slices=cfg.seir_n_slices, seed=cfg.seed
        )
        X, y = seir_features_targets(data, out_idx=cfg.seir_out_idx)
        A = seir_temporal_adjacency(data)
        M = make_m_matrix(spec.s_train, 20)
        if cfg.seir_normalize:
            from tmgcn_tpu.preprocess.pipeline import normalize_laplacian

            A = normalize_laplacian(A)
        windows = {w: A.slice_window(*spec.bounds(w)) for w in WINDOWS}
        Ct = {w: m_transform_coo(windows[w], M) for w in WINDOWS}
        feats = window_features(X, spec)
        if cfg.standardize_features:
            feats = _standardize(feats)
        return ExperimentData(
            spec=spec,
            adj=Ct,
            feats=feats,
            M=M,
            edge_index=None,
            edge_values=None,
            lp_edges=None,
            lp_labels=None,
            reg_targets=window_features(y, spec),
        )

    # Real dataset via registry: load a .mat artifact if given/cached,
    # else preprocess from the raw file (and cache the artifact).
    spec_entry = dsets.REGISTRY[cfg.dataset]
    p = spec_entry.preprocess
    spec = WindowSpec(p.s_train, p.s_val, p.s_test,
                      same_block_size=cfg.same_block_size)

    if artifact is None and data_dir is not None:
        cached = Path(data_dir) / f"saved_content_{cfg.dataset}.mat"
        if cached.exists():
            artifact = cached

    if artifact is not None and Path(artifact).exists():
        loaded = load_artifact(artifact, s_train=p.s_train, min_slices=spec.total)
        A_bin = loaded["A_binary"]
        A_labels = loaded["A_labels"]
        M = loaded["M"]
        Ct = loaded["Ct"]
        C_full = loaded.get("C")
    else:
        if data_dir is None:
            raise FileNotFoundError(
                f"dataset {cfg.dataset!r} needs --data-dir with {spec_entry.filename} "
                "or --artifact pointing at a preprocessed .mat"
            )
        raw = dsets.load_raw(spec_entry, data_dir)
        pre = preprocess(raw, p)
        cached = Path(data_dir) / f"saved_content_{cfg.dataset}.mat"
        try:
            save_artifact(cached, pre)
        except OSError:
            pass
        # Mirror the driver: A for features is ones on A_labels support.
        labels_edges = pre.A_labels.edge_list()
        A_bin = TemporalCOO.from_global_coo(
            labels_edges[0],
            labels_edges[1],
            labels_edges[2],
            np.ones(labels_edges.shape[1]),
            pre.A_labels.n_slices,
            pre.A_labels.n_nodes,
        )
        A_labels = pre.A_labels
        M = pre.M
        Ct = pre.Ct_windows
        C_full = pre.C

    X = degree_features_np(A_bin)
    if X.shape[0] < spec.total:
        # Raw data spanning fewer slices than the window total: pad with
        # empty slices, mirroring the pipeline's C padding
        # (read_data.py:168-170 extends TT up to T+S_val+S_test).
        pad = np.zeros((spec.total - X.shape[0],) + X.shape[1:])
        X = np.concatenate([X, pad], axis=0)
    feats = window_features(X, spec)
    if cfg.standardize_features:
        feats = _standardize(feats)

    if cfg.method == "tmgcn":
        adj = Ct
    else:
        if C_full is None:
            raise ValueError("artifact lacks C (untransformed) needed by baselines")
        adj = _disjoint_windows(C_full, spec)

    edge_index, edge_values = A_labels.edge_list(with_values=True)

    lp_edges = lp_labels = None
    if cfg.task == "link_pred":
        aug, labels = augment_edges(
            edge_index, A_labels.n_nodes, cfg.beta1, cfg.beta2, cfg.cutoff, seed=cfg.seed
        )
        lp_edges, lp_labels = aug, labels

    return ExperimentData(
        spec=spec,
        adj=adj,
        feats=feats,
        M=M,
        edge_index=edge_index,
        edge_values=edge_values,
        lp_edges=lp_edges,
        lp_labels=lp_labels,
        reg_targets=None,
    )


def _model_dtype(cfg: ExperimentConfig):
    return jnp.dtype(cfg.dtype)


def build_model(cfg: ExperimentConfig, n_slices: int, in_feat: int):
    dtype = _model_dtype(cfg)
    hf = tuple(cfg.hidden_feat)
    if cfg.task == "regression":
        if cfg.method == "tmgcn":
            return TMGCNReg(
                n_slices=n_slices,
                in_feat=in_feat,
                hidden_feat=hf,
                condensed_W=cfg.condensed_W,
                use_Minv=cfg.use_Minv,
                dtype=dtype,
                spmm_impl=cfg.spmm_impl,
            )
        if cfg.method == "evolvegcn":
            return EvolveGCNReg(n_slices=n_slices, in_feat=in_feat, hidden_feat=hf, dtype=dtype)
        if cfg.method == "wdgcn":
            return WDGCNReg(
                n_slices=n_slices, in_feat=in_feat, hidden_feat=hf, dtype=dtype,
                spmm_impl=cfg.spmm_impl,
            )
        raise ValueError(f"no regression variant for method {cfg.method!r}")

    if cfg.method == "tmgcn":
        if cfg.n_layers == 2:
            return TMGCN2(
                n_slices=n_slices,
                in_feat=in_feat,
                hidden_feat=hf,
                condensed_W=cfg.condensed_W,
                use_Minv=cfg.use_Minv,
                apply_M_twice=cfg.apply_M_twice,
                apply_M_three_times=cfg.apply_M_three_times,
                nonlin2=cfg.nonlin2,
                dtype=dtype,
                spmm_impl=cfg.spmm_impl,
            )
        return TMGCN(
            n_slices=n_slices,
            in_feat=in_feat,
            hidden_feat=hf,
            condensed_W=cfg.condensed_W,
            use_Minv=cfg.use_Minv,
            dtype=dtype,
            spmm_impl=cfg.spmm_impl,
            readout=cfg.readout,
        )
    if cfg.method == "gcn":
        return KWGCN(
            n_slices=n_slices,
            in_feat=in_feat,
            hidden_feat=hf,
            nonlin2=cfg.nonlin2,
            dtype=dtype,
            spmm_impl=cfg.spmm_impl,
        )
    if cfg.method == "evolvegcn":
        return EvolveGCN(n_slices=n_slices, in_feat=in_feat, hidden_feat=hf, dtype=dtype)
    if cfg.method == "wdgcn":
        return WDGCN(
            n_slices=n_slices, in_feat=in_feat, hidden_feat=hf, dtype=dtype,
            spmm_impl=cfg.spmm_impl,
        )
    raise ValueError(f"unknown method {cfg.method!r}")


def run_tag(trial: int, alpha: float | None) -> str:
    """Checkpoint/results tag for one (trial, alpha) run."""
    return f"tr{trial}" + (f"_w{round((alpha or 0) * 100)}" if alpha else "")


def _make_adapter(cfg, model, data, splits_edges, mesh_shape, drop_last_slice=False):
    """Single-device or sharded adapter, depending on mesh_shape."""
    M = data.M if cfg.method == "tmgcn" else None
    if mesh_shape is None:
        return make_edge_adapter(
            model, data.adj, data.feats, splits_edges, M=M,
            drop_last_slice=drop_last_slice,
        )
    if cfg.method not in ("tmgcn", "gcn", "evolvegcn", "wdgcn"):
        raise NotImplementedError(
            f"--mesh supports tmgcn/gcn/evolvegcn/wdgcn models, not {cfg.method!r}"
        )
    from tmgcn_tpu.parallel.adapter import make_sharded_edge_adapter
    from tmgcn_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(*mesh_shape)
    return make_sharded_edge_adapter(
        model, data.adj, data.feats, splits_edges, data.M, mesh,
        drop_last_slice=drop_last_slice,
    )


def run_experiment(
    cfg: ExperimentConfig,
    data_dir: str | Path | None = None,
    artifact: str | Path | None = None,
    n_epochs: int | None = None,
    alpha_vec: tuple[float, ...] | None = None,
    verbose: bool = True,
    checkpoint_dir: str | Path | None = None,
    mesh_shape: tuple[int, int] | None = None,
) -> dict:
    """Run the full (trials x alpha) sweep of one experiment config.

    mesh_shape=(n_graph, n_time) runs training through the sharded
    (graph x time) execution path (parallel/adapter.py): TM-GCN cls/LP/
    regression on the full mesh; EvolveGCN/WD-GCN (cls, LP, regression)
    over the graph axis (n_time must be 1 — they recur over time).

    Returns {"results": {(trial, alpha): array}, "final": summary dict}.
    """
    data = build_data(cfg, data_dir=data_dir, artifact=artifact)
    n_epochs = n_epochs if n_epochs is not None else cfg.n_epochs
    alphas = alpha_vec if alpha_vec is not None else cfg.alpha_vec
    tcfg = TrainConfig(
        n_epochs=n_epochs,
        lr=cfg.lr,
        momentum=cfg.momentum,
        eval_every=cfg.eval_every,
        verbose=verbose,
        optimizer=cfg.optimizer,
        grad_clip=cfg.grad_clip,
    )

    in_feat = data.feats["train"].shape[-1]
    results: dict = {}
    key = jax.random.PRNGKey(cfg.seed)

    def _checkpointer(tr, alpha):
        if checkpoint_dir is None:
            return None
        from tmgcn_tpu.train.checkpoint import RunCheckpointer

        return RunCheckpointer(Path(checkpoint_dir) / cfg.name / run_tag(tr, alpha))

    if cfg.task == "regression":
        model = build_model(cfg, data.spec.s_train, in_feat)
        if mesh_shape is None:
            adapter = make_regression_adapter(
                model, data.adj, data.feats, M=data.M if cfg.method != "gcn" else None
            )
        else:
            from tmgcn_tpu.parallel.adapter import make_sharded_regression_adapter
            from tmgcn_tpu.parallel.mesh import make_mesh

            adapter = make_sharded_regression_adapter(
                model, data.adj, data.feats,
                data.M if cfg.method == "tmgcn" else None,
                make_mesh(*mesh_shape),
            )
        for tr in range(cfg.n_trials):
            key, sub = jax.random.split(key)
            res, _ = run_regression(
                adapter, data.reg_targets, tcfg, key=sub,
                checkpointer=_checkpointer(tr, None),
            )
            results[(tr, None)] = res
        return {"results": results, "spec": data.spec}

    if cfg.task == "edge_cls":
        splits = split_edges_classification(
            data.edge_index, data.edge_values, data.spec, n_classes=cfg.n_classes
        )
        model = build_model(cfg, data.spec.s_train, in_feat)
        adapter = _make_adapter(
            cfg, model, data, {w: splits[w].edges for w in WINDOWS}, mesh_shape
        )
        for tr in range(cfg.n_trials):
            for alpha in alphas:
                key, sub = jax.random.split(key)
                if cfg.n_classes == 3:
                    cw = np.array([1 / 3, 1 / 3, 1 / 3])
                else:
                    cw = np.array([alpha, 1.0 - alpha])
                res, _ = run_edge_classification(
                    adapter, splits, cw, tcfg, key=sub,
                    checkpointer=_checkpointer(tr, alpha),
                )
                results[(tr, alpha)] = res
        return {"results": results, "spec": data.spec}

    # Link prediction.
    splits = split_data_link_prediction(data.lp_edges, data.lp_labels, data.spec)
    model = build_model(cfg, data.spec.s_train - 1, in_feat)
    adapter = _make_adapter(
        cfg, model, data, {w: splits[w].model_edges for w in WINDOWS}, mesh_shape,
        drop_last_slice=True,
    )
    for tr in range(cfg.n_trials):
        for alpha in alphas:
            key, sub = jax.random.split(key)
            cw = np.array([alpha, 1.0 - alpha])
            res, _ = run_link_prediction(
                adapter, splits, cw, tcfg, key=sub,
                checkpointer=_checkpointer(tr, alpha),
                loss_type=cfg.loss_type,
                eval_type=cfg.eval_type,
            )
            results[(tr, alpha)] = res
    return {"results": results, "spec": data.spec}
