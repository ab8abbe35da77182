"""Analytic comm model: structural invariants (utils/comm_model.py)."""

import numpy as np
import pytest

from tmgcn_tpu.utils.comm_model import (
    CHESS_CLS,
    CHESS_CLS2,
    SCALED,
    crossover,
    mesh_shapes,
    predict,
    ring_all_reduce_bytes,
    step_comm_bytes,
)


def test_single_device_has_no_comm():
    c = step_comm_bytes(CHESS_CLS, 1, 1)
    assert c["total"] == 0.0


def test_ring_all_reduce_formula():
    # 2(n-1)/n of the buffer per device; n=1 is free.
    assert ring_all_reduce_bytes(100, 1) == 0.0
    assert ring_all_reduce_bytes(100, 2) == 100.0
    np.testing.assert_allclose(ring_all_reduce_bytes(96, 4), 144.0)


def test_trainstep_drops_logit_allgather():
    full = step_comm_bytes(CHESS_CLS, 1, 8)
    train = step_comm_bytes(CHESS_CLS, 1, 8, train_only=True)
    assert full["logit_allgather_time"] > 0
    assert train["logit_allgather_time"] == 0.0
    assert train["total"] < full["total"]


def test_two_layer_row_allgather_dominates_graph_meshes():
    # Sharding the graph axis on the 2-layer model must cost the row
    # all-gather; a pure time mesh avoids it.
    g_mesh = step_comm_bytes(CHESS_CLS2, 8, 1)
    t_mesh = step_comm_bytes(CHESS_CLS2, 1, 8)
    assert g_mesh["row_allgather_graph"] > 0
    assert "row_allgather_graph" not in t_mesh or t_mesh["row_allgather_graph"] == 0
    assert g_mesh["total"] > t_mesh["total"]


def test_efficiency_monotone_in_transport():
    ici = predict(SCALED, 1, 8, "ici")
    dcn = predict(SCALED, 1, 8, "dcn")
    assert ici["predicted_efficiency"] >= dcn["predicted_efficiency"]


def test_trainstep_crossover_at_least_eval():
    for w in (CHESS_CLS, CHESS_CLS2, SCALED):
        ev = crossover(w, "ici")
        tr = crossover(w, "ici", key="predicted_efficiency_trainstep")
        if ev is not None and tr is not None:
            assert tr["devices"] >= ev["devices"]


def test_mesh_shapes_factorize():
    for g, t in mesh_shapes(12):
        assert g * t == 12


def test_m2_halo_counted_only_for_m2_workloads():
    from tmgcn_tpu.utils.comm_model import UCI_M3

    c = step_comm_bytes(UCI_M3, 1, 4)
    assert c.get("m2_halo_ppermute_time", 0) > 0
    assert "m2_halo_ppermute_time" not in step_comm_bytes(CHESS_CLS2, 1, 4)
    # Graph sharding shrinks the per-device halo rows.
    c2 = step_comm_bytes(UCI_M3, 2, 4)
    assert c2["m2_halo_ppermute_time"] < c["m2_halo_ppermute_time"]


def test_derived_backward_factors():
    """psum collectives transpose for free; all-gathers pay 2x (module
    docstring derivation) — the derived total must sit between the
    forward sum and the old uniform 2x."""
    c = step_comm_bytes(CHESS_CLS2, 4, 2)
    fwd = (
        c["readout_psum_graph"] + c["logit_allgather_time"]
        + c["grad_psum"] + c["row_allgather_graph"]
    )
    assert c["total"] == pytest.approx(
        fwd + c["logit_allgather_time"] + c["row_allgather_graph"]
    )
    assert fwd < c["total"] < c["uniform_2x_total"]


def test_recurrent_families_graph_only():
    from tmgcn_tpu.utils.comm_model import (
        CHESS_EVOLVE1, CHESS_EVOLVE2, CHESS_WDGCN, crossover,
    )

    with pytest.raises(AssertionError):
        step_comm_bytes(CHESS_WDGCN, 2, 4)  # t>1 forbidden
    c1 = step_comm_bytes(CHESS_EVOLVE1, 8, 1)
    c2 = step_comm_bytes(CHESS_EVOLVE2, 8, 1)
    cw = step_comm_bytes(CHESS_WDGCN, 8, 1)
    # 2-layer EvolveGCN pays the H1 all-gather; the others don't.
    assert c2["h1_allgather_graph"] > 0 and c2["topk_allgather_graph"] > 0
    assert "h1_allgather_graph" not in c1 and "h1_allgather_graph" not in cw
    assert c2["total"] > c1["total"]
    # Crossovers restrict to graph-only meshes.
    xo = crossover(CHESS_WDGCN, "ici")
    assert xo is None or xo["mesh"].endswith("x1")
