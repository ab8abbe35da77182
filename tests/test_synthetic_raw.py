"""Synthetic raw generators parse through the real loading pipeline."""

import numpy as np
import pytest

from tmgcn_tpu.preprocess.datasets import REGISTRY, load_raw
from tmgcn_tpu.preprocess.synthetic_raw import SYNTH, generate


@pytest.mark.parametrize("name", sorted(SYNTH))
def test_generates_and_loads(tmp_path, name):
    spec = REGISTRY[name]
    p = spec.preprocess
    path = generate(name, tmp_path, seed=0)
    assert path.exists() and path.name == spec.filename
    raw = load_raw(spec, tmp_path)
    needed = p.s_train + p.s_val + p.s_test
    assert raw.n_slices >= min(needed, SYNTH[name].n_slices), (
        f"{name}: {raw.n_slices} slices < {needed}"
    )
    assert raw.n_nodes <= SYNTH[name].n_nodes
    assert len(raw.src) > SYNTH[name].n_edges * 0.5
    # Every slice touched (generator guarantee).
    assert len(np.unique(raw.slice_id)) == raw.n_slices


def test_deterministic(tmp_path):
    p1 = generate("uci", tmp_path / "a", seed=3)
    p2 = generate("uci", tmp_path / "b", seed=3)
    assert p1.read_text() == p2.read_text()


def test_preprocess_end_to_end(tmp_path):
    """One full preprocess run (uci: smallest canonical window set)."""
    from tmgcn_tpu.preprocess.pipeline import preprocess

    spec = REGISTRY["uci"]
    generate("uci", tmp_path, seed=0)
    raw = load_raw(spec, tmp_path)
    pre = preprocess(raw, spec.preprocess)
    assert pre.M.shape[0] == spec.preprocess.s_train
    assert pre.Ct_windows["train"].n_slices == spec.preprocess.s_train
    assert np.isfinite(np.asarray(pre.Ct_windows["train"].vals)).all()


@pytest.mark.parametrize("name", ["hep_th", "wikiconflict", "eu_core"])
def test_preprocess_only_datasets(tmp_path, name):
    """The reference preprocesses hep-th/wikiconflict/eu-core without ever
    training on them (read_data.m:50-60,93-95 — no experiment scripts);
    parity requires OUR pipeline to run them end-to-end too, including
    the wikiconflict column-sum >= 100 node filter (read_data.m:154-170).
    """
    from tmgcn_tpu.preprocess.pipeline import preprocess

    spec = REGISTRY[name]
    generate(name, tmp_path, seed=0)
    raw = load_raw(spec, tmp_path)
    pre = preprocess(raw, spec.preprocess)
    p = spec.preprocess
    assert pre.M.shape == (p.s_train, p.s_train)
    for w in ("train", "val", "test"):
        assert pre.Ct_windows[w].n_slices == p.s_train
        assert np.isfinite(np.asarray(pre.Ct_windows[w].vals)).all()
    if name == "wikiconflict":
        # The filter must actually bite: synthetic wikiconflict has many
        # low-degree nodes below the 100 column-sum threshold.
        from tmgcn_tpu.preprocess.pipeline import filter_nodes_by_column_sum

        kept = filter_nodes_by_column_sum(raw, p.min_column_sum)
        assert kept.n_nodes < raw.n_nodes


def test_signed_signal(tmp_path):
    """Bitcoin-like weights carry community-correlated sign (learnable)."""
    spec = REGISTRY["bitcoin_alpha"]
    generate("bitcoin_alpha", tmp_path, seed=0)
    raw = load_raw(spec, tmp_path)
    frac_pos = float((raw.weight > 0).mean())
    assert 0.5 < frac_pos < 0.95  # mixed but not balanced-noise
