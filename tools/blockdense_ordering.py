"""Node-ordering study for the block-dense operator (negative result).

VERDICT round-2 #3 suggested wiring "row-clustering" into the full-row
path. Measured on the real chess train graph (T=80, N=7301, 2.32M
global nnz), every classical clustering permutation RAISES the block
count over the natural appearance order the preprocessing already
produces (nodes are numbered by first appearance; edges are temporally
local, so early slices touch a small dense id prefix):

    ordering          nonempty 128x128 blocks   bytes/gather-floor ratio
    identity          56,870                    0.392   <- best
    RCM (union graph) 71,628                    0.494
    degree-desc       73,294                    0.505
    first-seen,degree 73,294                    0.505
    activity,degree   73,294                    0.505

Auto-selection therefore keeps the input ordering and picks the
operator by the byte model alone (ops/spmm.make_auto_operator).

Run:  python tools/blockdense_ordering.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    import jax

    if jax.default_backend() != "tpu":
        jax.config.update("jax_platforms", "cpu")
    from bench import prepare

    from tmgcn_tpu.ops.spmm_blockdense import estimate
    from tmgcn_tpu.ops.spmm_rowsplit import flatten_stream

    _, data, _ = prepare()
    A = data.adj["train"]
    g_r, g_c, _ = flatten_stream(A)
    T, N = A.n_slices, A.n_nodes
    r, c, t = g_r % N, g_c % N, g_r // N

    def report(inv: np.ndarray, name: str) -> None:
        e = estimate(t * N + inv[r], (g_c // N) * N + inv[c])
        print(
            f"{name:18s} blocks={e['n_blocks']:6d} ratio={e['ratio']:.3f} "
            f"nnz/blk={e['nnz'] / e['n_blocks']:.1f}"
        )

    report(np.arange(N), "identity")

    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    U = sp.csr_matrix((np.ones(len(r), np.float32), (r, c)), shape=(N, N))
    perm = reverse_cuthill_mckee(U + U.T, symmetric_mode=True)
    inv = np.empty(N, np.int64)
    inv[perm] = np.arange(N)
    report(inv, "rcm")

    deg = np.bincount(r, minlength=N) + np.bincount(c, minlength=N)
    for name, order in (
        ("degree-desc", np.argsort(-deg, kind="stable")),
        ("first-seen,degree", None),
    ):
        if order is None:
            first = np.full(N, T, np.int64)
            np.minimum.at(first, r, t)
            np.minimum.at(first, c, t)
            order = np.lexsort((-deg, first))
        inv = np.empty(N, np.int64)
        inv[order] = np.arange(N)
        report(inv, name)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
