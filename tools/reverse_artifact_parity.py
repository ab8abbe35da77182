"""Reverse artifact parity: reference read_data.py -> our loader.

Round-1 proved the forward direction (the reference driver consumed OUR
chess .mat). This closes the loop the other way: run the reference's own
Python preprocessing (/root/reference/TensorGCN-master/read_data.py) on
the in-repo chess CSV, load the artifact it produces with
``matio.load_artifact``, and assert tensor-level equality against our
pipeline's artifact.

    python tools/reverse_artifact_parity.py generate   # slow: runs the
        reference script (per-nnz Python loops) -> results/saved_content_python_chess.mat
    python tools/reverse_artifact_parity.py compare    # fast: asserts parity

Patches applied to the reference source (it is executed, not copied):
its hard-coded absolute paths, and its chess ``np.loadtxt`` call —
written as ``delimiter=','`` although the KONECT chess file is
whitespace-separated with a '%' header, so the script as shipped cannot
parse its own dataset (the authors evidently kept a converted local
copy).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference/TensorGCN-master/read_data.py")
OUT_DIR = REPO / "results"
REF_ARTIFACT = OUT_DIR / "saved_content_python_chess.mat"
OUR_ARTIFACT = REPO / "data/chess/saved_content_chess.mat"


def generate() -> None:
    src = REF.read_text()
    patches = [
        (
            "np.loadtxt('/home/shivmaran/Desktop/Tensor-GCN/data/chess/"
            "out.chess.csv', delimiter=',', skiprows=1)",
            f"np.loadtxt({str(REPO / 'data/chess/out.chess.csv')!r}, "
            "comments='%', skiprows=1)",
        ),
        (
            "save_file_location = '/home/shivmaran/Desktop/Tensor-GCN/data/chess/'",
            f"save_file_location = {str(OUT_DIR) + '/'!r}",
        ),
    ]
    for old, new in patches:
        assert old in src, f"reference source changed; patch not found: {old[:60]}"
        src = src.replace(old, new)
    OUT_DIR.mkdir(exist_ok=True)
    t0 = time.time()
    exec(compile(src, "read_data_patched.py", "exec"), {"__name__": "ref_read_data"})
    print(f"reference preprocessing done in {time.time() - t0:.0f}s -> {REF_ARTIFACT}")


def compare() -> int:
    import dataclasses

    import numpy as np

    from tmgcn_tpu.preprocess.datasets import REGISTRY, load_raw
    from tmgcn_tpu.preprocess.matio import load_artifact
    from tmgcn_tpu.preprocess.pipeline import preprocess

    assert REF_ARTIFACT.exists(), "run `generate` first"
    ref = load_artifact(REF_ARTIFACT, s_train=80, min_slices=100)

    # The reference disagrees with ITSELF about M: read_data.m weights
    # diagonal d by 1/(d+1) without row normalization (M_choice=2,
    # read_data.m:116-127) — the convention our dataset registry follows —
    # while its Python port builds 1-weighted diagonals then
    # row-normalizes (read_data.py:56-61). Since the artifact under test
    # comes from read_data.py, build our side with that convention.
    spec = REGISTRY["chess"]
    pcfg = dataclasses.replace(
        spec.preprocess, m_weight="ones", m_row_normalize=True
    )
    raw = load_raw(spec, REPO / "data/chess")
    ours = preprocess(raw, pcfg)

    assert ref["n_nodes"] == ours.A.n_nodes, (ref["n_nodes"], ours.A.n_nodes)
    np.testing.assert_allclose(ref["M"], np.asarray(ours.M), atol=1e-12)
    print(f"  M: {ref['M'].shape} equal (atol 1e-12)")

    def check(name, a, b, atol=1e-10):
        ea, va = a.edge_list(with_values=True)
        eb, vb = b.edge_list(with_values=True)
        assert ea.shape == eb.shape, f"{name}: nnz {ea.shape} vs {eb.shape}"
        np.testing.assert_array_equal(ea, eb, err_msg=f"{name} subscripts")
        np.testing.assert_allclose(va, vb, atol=atol, err_msg=f"{name} values")
        print(f"  {name}: {ea.shape[1]} nnz equal (values atol {atol})")

    check("A_labels", ref["A_labels"], ours.A_labels)
    check("A (binary counts)", ref["A"], ours.A)
    if "C" in ref:
        check("C (normalized)", ref["C"], ours.C)
    for w in ("train", "val", "test"):
        # Both pipelines compute the M-product in f64 but the containers
        # store f32; the truncation happens after different accumulation
        # orders, so values agree to 1 ulp of f32, not exactly.
        check(f"Ct_{w}", ref["Ct"][w], ours.Ct_windows[w], atol=1e-6)
    print("reverse artifact parity: PASS")
    return 0


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "compare"
    if mode == "generate":
        generate()
    else:
        raise SystemExit(compare())
