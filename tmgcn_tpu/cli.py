"""Command-line entry point.

    python -m tmgcn_tpu.cli list
    python -m tmgcn_tpu.cli run chess_tmgcn_cls --data-dir data/chess \
        --epochs 500 --alphas 0.9 --out results/
    python -m tmgcn_tpu.cli preprocess chess --data-dir data/chess

Replaces the reference's edit-the-script configuration (every experiment
is a named preset; every reference setting is a flag).
"""

from __future__ import annotations

import argparse
import json
import pickle
import time
from pathlib import Path

import numpy as np


def _cmd_list(args) -> int:
    from tmgcn_tpu.configs.presets import PRESETS

    for name in sorted(PRESETS):
        cfg = PRESETS[name]
        print(f"{name:32s} dataset={cfg.dataset:14s} method={cfg.method:10s} task={cfg.task}")
    return 0


def _cmd_preprocess(args) -> int:
    from tmgcn_tpu.preprocess.datasets import REGISTRY, load_raw
    from tmgcn_tpu.preprocess.matio import save_artifact
    from tmgcn_tpu.preprocess.pipeline import preprocess

    spec = REGISTRY[args.dataset]
    t0 = time.time()
    raw = load_raw(spec, args.data_dir)
    data = preprocess(raw, spec.preprocess)
    out = Path(args.out or args.data_dir) / f"saved_content_{args.dataset}.mat"
    save_artifact(out, data)
    print(
        f"{args.dataset}: N={raw.n_nodes} T={raw.n_slices} "
        f"edges={len(raw.src)} -> {out} in {time.time() - t0:.1f}s"
    )
    return 0


def _cmd_synth(args) -> int:
    from tmgcn_tpu.preprocess.synthetic_raw import SYNTH, generate

    names = [args.dataset] if args.dataset else sorted(SYNTH)
    for name in names:
        path = generate(name, Path(args.out) / name, seed=args.seed)
        print(f"{name}: {path}")
    return 0


def _cmd_predict(args) -> int:
    """Inference: restore a trained checkpoint and score a window's edges.

    Rebuilds the adapter for the preset, restores the latest Orbax
    checkpoint saved by ``run --checkpoint-dir`` (params and frozen
    buffers), threads the evolved-weight carry train -> val -> test as
    the training loops do, and writes the requested window's per-edge
    scores plus the protocol metrics.
    """
    import dataclasses

    import jax

    from tmgcn_tpu.configs.build import _make_adapter, build_data, build_model
    from tmgcn_tpu.configs.presets import get_preset
    from tmgcn_tpu.tasks import metrics as M
    from tmgcn_tpu.tasks.windows import (
        split_data_link_prediction,
        split_edges_classification,
    )
    from tmgcn_tpu.train.checkpoint import RunCheckpointer

    cfg = get_preset(args.preset)
    if args.seed is not None:
        cfg = dataclasses.replace(cfg, seed=args.seed)
    data = build_data(cfg, data_dir=args.data_dir, artifact=args.artifact)
    in_feat = data.feats["train"].shape[-1]
    windows = ("train", "val", "test")

    if cfg.task == "edge_cls":
        splits = split_edges_classification(
            data.edge_index, data.edge_values, data.spec, n_classes=cfg.n_classes
        )
        model = build_model(cfg, data.spec.s_train, in_feat)
        adapter = _make_adapter(
            cfg, model, data, {w: splits[w].edges for w in windows}, None
        )
    elif cfg.task == "link_pred":
        splits = split_data_link_prediction(data.lp_edges, data.lp_labels, data.spec)
        model = build_model(cfg, data.spec.s_train - 1, in_feat)
        adapter = _make_adapter(
            cfg, model, data, {w: splits[w].model_edges for w in windows}, None,
            drop_last_slice=True,
        )
    else:
        raise SystemExit(f"predict supports edge_cls/link_pred, not {cfg.task!r}")

    from tmgcn_tpu.configs.build import run_tag

    alphas = cfg.alpha_vec or (None,)
    alpha = args.alpha if args.alpha is not None else alphas[0]
    # The checkpoint carries params AND frozen buffers; the init here
    # only provides shape/dtype templates.
    variables = adapter.init(jax.random.PRNGKey(cfg.seed))
    tag = run_tag(args.trial, alpha)
    ck = RunCheckpointer(Path(args.checkpoint_dir) / cfg.name / tag)
    restored = ck.restore_inference(variables["params"], variables["buffers"])
    if restored is None:
        raise SystemExit(f"no checkpoint under {args.checkpoint_dir}/{cfg.name}/{tag}")
    step, params, buffers = restored
    ck.close()
    variables = {"params": params, "buffers": buffers}

    carry = adapter.initial_carry(variables)
    outs = {}
    for w in windows:
        out, carry = adapter.apply(variables, adapter.bundles[w], carry)
        outs[w] = np.asarray(out)
    out = outs[args.window]
    s = splits[args.window]

    if cfg.task == "link_pred" and cfg.loss_type == "sigmoid":
        p = 1.0 / (1.0 + np.exp(-out.astype(np.float64)))
        out = np.concatenate([p, 1.0 - p], axis=1)

    if cfg.task == "edge_cls":
        mask = s.eval_mask
        prec, rec, f1 = M.precision_recall_f1(
            np.argmax(out[mask], 1), s.target[mask]
        )
        print(
            f"{cfg.name} [{args.window}] epoch {step}: "
            f"precision {prec:.4f} recall {rec:.4f} f1 {f1:.4f} "
            f"({int(mask.sum())} eval edges)"
        )
        edges_out = s.edges
    else:
        if s.n_eval_tail is not None:
            K = s.n_eval_tail
            out_np, tgt_np, metric_edges = out[-K:], s.target[-K:], s.edges[:, -K:]
        else:
            keep = s.edges[0] != 0
            out_np, tgt_np, metric_edges = out, s.target[keep], s.edges[:, keep]
        mp, mr = M.map_mrr(out_np, tgt_np, metric_edges)
        print(
            f"{cfg.name} [{args.window}] epoch {step}: "
            f"MAP {mp:.4f} MRR {mr:.4f} ({out_np.shape[0]} eval edges)"
        )
        edges_out = s.model_edges

    if args.out:
        path = Path(args.out)
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(path, scores=out, edges=edges_out, epoch=step)
        print(f"wrote {path}")
    return 0


def _parse_mesh(spec: str) -> tuple[int, int]:
    """Parse 'graph=G,time=T' (either key optional, any order)."""
    parts = dict(
        kv.split("=", 1) for kv in spec.replace(" ", "").split(",") if kv
    )
    unknown = set(parts) - {"graph", "time"}
    if unknown:
        raise SystemExit(f"--mesh: unknown axes {sorted(unknown)}; use graph=G,time=T")
    return int(parts.get("graph", 1)), int(parts.get("time", 1))


def _cmd_run(args) -> int:
    import dataclasses

    import jax

    from tmgcn_tpu.configs.build import run_experiment
    from tmgcn_tpu.configs.presets import get_preset

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    cfg = get_preset(args.preset)
    if args.seed is not None:
        cfg = dataclasses.replace(cfg, seed=args.seed)
    if args.spmm_impl is not None:
        cfg = dataclasses.replace(cfg, spmm_impl=args.spmm_impl)
    alphas = tuple(args.alphas) if args.alphas else None
    mesh_shape = _parse_mesh(args.mesh) if args.mesh else None
    t0 = time.time()
    import contextlib

    profile_cm = contextlib.nullcontext()
    if args.profile:
        from tmgcn_tpu.utils.profiling import trace

        profile_cm = trace(args.profile)
    with profile_cm:
        out = run_experiment(
            cfg,
            data_dir=args.data_dir,
            artifact=args.artifact,
            n_epochs=args.epochs,
            alpha_vec=alphas,
            verbose=not args.quiet,
            checkpoint_dir=args.checkpoint_dir,
            mesh_shape=mesh_shape,
        )
    elapsed = time.time() - t0
    print(f"{cfg.name}: {len(out['results'])} runs in {elapsed:.1f}s")

    if args.out:
        from tmgcn_tpu.train.logging import summarize, write_metrics_jsonl

        out_dir = Path(args.out)
        out_dir.mkdir(parents=True, exist_ok=True)
        summary = {"preset": cfg.name, "elapsed_s": elapsed, "runs": {}}
        for (tr, alpha), res in out["results"].items():
            tag = f"{cfg.name}_tr{tr}" + (f"_w{round((alpha or 0) * 100)}" if alpha else "")
            if isinstance(res, np.ndarray):
                with open(out_dir / f"results_{tag}.pkl", "wb") as f:
                    pickle.dump(res, f)
                write_metrics_jsonl(
                    out_dir / f"metrics_{tag}.jsonl",
                    res,
                    eval_every=cfg.eval_every,
                    run_info={"preset": cfg.name, "trial": tr, "alpha": alpha},
                )
                summary["runs"][tag] = summarize(res, cfg.eval_every)
            else:  # regression: dict result
                with open(out_dir / f"results_{tag}.pkl", "wb") as f:
                    pickle.dump(res, f)
                summary["runs"][tag] = {
                    k: (float(v) if np.isscalar(v) else None) for k, v in res.items()
                }
        (out_dir / f"summary_{cfg.name}.json").write_text(json.dumps(summary, indent=2))
        print(f"results written to {out_dir}")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tmgcn_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list experiment presets")

    sp = sub.add_parser("synth", help="generate synthetic raw dataset files")
    sp.add_argument("--dataset", help="one dataset (default: all)")
    sp.add_argument("--out", default="data/synthetic")
    sp.add_argument("--seed", type=int, default=0)

    pp = sub.add_parser("preprocess", help="raw edge list -> .mat artifact")
    pp.add_argument("dataset")
    pp.add_argument("--data-dir", required=True)
    pp.add_argument("--out")

    fp = sub.add_parser(
        "fetch",
        help="download a REAL dataset (URL+sha256 manifest, "
             "preprocess/fetch.py) into --data-root/<name>/",
    )
    fp.add_argument("dataset", help="dataset name or 'all'")
    fp.add_argument("--data-root", default="data/real")

    rp = sub.add_parser("run", help="run an experiment preset")
    rp.add_argument("preset")
    rp.add_argument("--data-dir")
    rp.add_argument("--artifact")
    rp.add_argument("--epochs", type=int)
    rp.add_argument("--alphas", type=float, nargs="*")
    rp.add_argument("--out")
    rp.add_argument("--checkpoint-dir")
    rp.add_argument("--mesh", help="sharded execution, e.g. graph=4,time=2")
    rp.add_argument(
        "--spmm-impl",
        choices=["jnp", "rowsplit", "pallas", "pallas_bf16",
                 "blockdense", "blockdense_bf16"],
        help="override the preset's SpMM implementation",
    )
    rp.add_argument(
        "--profile",
        metavar="DIR",
        help="capture a JAX profiler trace of the run into DIR "
             "(view with TensorBoard or Perfetto)",
    )
    rp.add_argument("--seed", type=int)
    rp.add_argument("--debug-nans", action="store_true",
                    help="raise on the first NaN produced on device")
    rp.add_argument("--quiet", action="store_true")

    pp2 = sub.add_parser(
        "predict", help="restore a checkpoint and score a window's edges"
    )
    pp2.add_argument("preset")
    pp2.add_argument("--data-dir")
    pp2.add_argument("--artifact")
    pp2.add_argument("--checkpoint-dir", required=True)
    pp2.add_argument("--window", choices=["train", "val", "test"], default="test")
    pp2.add_argument("--trial", type=int, default=0)
    pp2.add_argument("--alpha", type=float)
    pp2.add_argument("--seed", type=int)
    pp2.add_argument("--out", help="write scores/edges to this .npz")

    args = ap.parse_args(argv)
    if args.cmd == "list":
        return _cmd_list(args)
    if args.cmd == "synth":
        return _cmd_synth(args)
    if args.cmd == "preprocess":
        return _cmd_preprocess(args)
    if args.cmd == "fetch":
        from tmgcn_tpu.preprocess.fetch import fetch, fetch_all

        if args.dataset == "all":
            res = fetch_all(args.data_root)
            failed = [k for k, v in res.items() if str(v).startswith("FAILED")]
            return 1 if failed else 0
        fetch(args.dataset, args.data_root)
        return 0
    if args.cmd == "run":
        return _cmd_run(args)
    if args.cmd == "predict":
        return _cmd_predict(args)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
