"""Fetch manifest: extraction, checksum pinning, and validation.

Network-free: the test serves archives via file:// URLs and
monkeypatches the manifest, exercising the exact code path a real
download takes (capability reference: the reference's datasets are
manual downloads named in read_data.m:13-103; the framework makes
acquisition a validated one-command step).
"""

import gzip
import json

import numpy as np
import pytest

from tmgcn_tpu.preprocess import fetch as F
from tmgcn_tpu.preprocess.synthetic_raw import generate


@pytest.fixture()
def manifest_env(tmp_path, monkeypatch):
    """A local 'remote': the bitcoin_otc synthetic raw, gzipped."""
    src_dir = tmp_path / "remote"
    raw = generate("bitcoin_otc", src_dir, seed=0)
    gz = src_dir / "soc-sign-bitcoinotc.csv.gz"
    with open(raw, "rb") as f_in, gzip.open(gz, "wb") as f_out:
        f_out.write(f_in.read())
    monkeypatch.setattr(
        F, "MANIFEST",
        {"bitcoin_otc": F.FetchSpec(gz.as_uri(), "gz")},
    )
    monkeypatch.setattr(F, "LOCK_PATH", tmp_path / "MANIFEST.lock.json")
    # The synthetic stand-in is smaller than the real dataset; scale the
    # published-statistics gate to it (the gate itself is exercised by
    # test_fetch_rejects_wrong_statistics below).
    monkeypatch.setitem(
        F.EXPECTED_STATS, "bitcoin_otc",
        {"rows": (20_000, 28_000), "nodes": (600, 1_000)},
    )
    return tmp_path, raw


def test_fetch_extracts_validates_and_pins(manifest_env):
    tmp_path, raw = manifest_env
    dest = F.fetch("bitcoin_otc", tmp_path / "real")
    assert dest.exists()
    assert dest.read_bytes() == raw.read_bytes()
    lock = json.loads((tmp_path / "MANIFEST.lock.json").read_text())
    assert lock["bitcoin_otc"]["sha256"] == F._sha256(dest)

    # Second fetch validates against the pinned hash (no error).
    F.fetch("bitcoin_otc", tmp_path / "real")


def test_fetch_rejects_hash_mismatch(manifest_env):
    tmp_path, _ = manifest_env
    dest = F.fetch("bitcoin_otc", tmp_path / "real")
    # Corrupt the file; re-validation must fail against the pinned hash.
    with open(dest, "ab") as f:
        f.write(b"tampered\n")
    with pytest.raises(RuntimeError, match="sha256 mismatch"):
        F.fetch("bitcoin_otc", tmp_path / "real")


def test_fetch_rejects_wrong_statistics(manifest_env, monkeypatch):
    """A truncated/substituted first download must be rejected BEFORE
    its hash is pinned (VERDICT round-4 directive #7): here the served
    file parses fine but its row count misses the published range."""
    tmp_path, _ = manifest_env
    monkeypatch.setitem(
        F.EXPECTED_STATS, "bitcoin_otc",
        {"rows": (33_000, 38_000), "nodes": (5_500, 6_300)},  # real ranges
    )
    with pytest.raises(RuntimeError, match="statistics mismatch"):
        F.fetch("bitcoin_otc", tmp_path / "real")
    # Nothing pinned, nothing left at dest to read as "already present".
    assert not (tmp_path / "MANIFEST.lock.json").exists()
    assert not (tmp_path / "real/bitcoin_otc/soc-sign-bitcoinotc.csv").exists()


def test_every_fetchable_dataset_has_stats():
    for name, spec in F.MANIFEST.items():
        if not spec.manual:
            assert name in F.EXPECTED_STATS, name


def test_manifest_covers_every_external_dataset():
    from tmgcn_tpu.preprocess.datasets import REGISTRY

    external = set(REGISTRY) - {"chess"}  # chess ships in-repo (also listed)
    assert external <= set(F.MANIFEST)
    # Every URL is http(s) and every tar entry names its member.
    for name, spec in F.MANIFEST.items():
        assert spec.url.startswith("http")
        if spec.kind == "tar.bz2":
            assert spec.member


def test_partial_extraction_cannot_poison_pin(manifest_env, monkeypatch):
    """A crash mid-extraction leaves no file at dest (temp + os.replace),
    and a corrupt-but-complete file fails parse validation BEFORE its
    hash is pinned."""
    import shutil as _shutil

    tmp_path, _ = manifest_env

    # 1) Simulate a crash during gz extraction: copyfileobj raises.
    def boom(*a, **k):
        raise OSError("simulated truncation")

    calls = {"n": 0}
    real = _shutil.copyfileobj

    def flaky(src, dst, *a, **k):
        calls["n"] += 1
        if calls["n"] == 2:  # first call downloads, second extracts
            raise OSError("simulated truncation")
        return real(src, dst, *a, **k)

    monkeypatch.setattr(F.shutil, "copyfileobj", flaky)
    with pytest.raises(OSError):
        F.fetch("bitcoin_otc", tmp_path / "real")
    monkeypatch.setattr(F.shutil, "copyfileobj", real)

    dest = tmp_path / "real/bitcoin_otc/soc-sign-bitcoinotc.csv"
    assert not dest.exists()  # no partial file at the final name
    assert not (tmp_path / "MANIFEST.lock.json").exists()  # nothing pinned

    # 2) A corrupt file that parses as garbage must not get pinned.
    dest.parent.mkdir(parents=True, exist_ok=True)
    dest.write_text("not,a,valid\nedge,list,at,all\n")
    with pytest.raises(Exception):
        F.fetch("bitcoin_otc", tmp_path / "real")
    lock = F._load_lock()
    assert "bitcoin_otc" not in lock
