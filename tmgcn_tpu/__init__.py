"""tmgcn_tpu — a TPU-native framework for dynamic graph neural networks.

A from-scratch JAX/XLA/Pallas implementation of tensor M-product message
passing (TM-GCN) and its baselines (EvolveGCN-H, WD-GCN, static GCN),
covering edge classification, link prediction, and node regression on
temporal graphs. Capability reference: IBM/TM-GCN (see SURVEY.md); the
design here is TPU-first and shares nothing structurally with the
reference's per-slice torch.sparse loops.

Layout:
    core/        temporal sparse tensor containers, M-matrix builders
    ops/         compute ops (SpMM, M-transform, edge readout) with jnp +
                 Pallas implementations behind one API
    kernels/     Pallas TPU kernels
    models/      TM-GCN, GCN, EvolveGCN-H, WD-GCN model families
    parallel/    device mesh, graph/time sharding, halo exchange
    preprocess/  raw edge lists -> normalized temporal adjacency tensors
    tasks/       edge classification / link prediction / node regression
    train/       training loops, optimizers, checkpointing, metric logging
    configs/     typed experiment configs reproducing every reference run
"""

__version__ = "0.1.0"

from tmgcn_tpu.core.sparse import TemporalCOO  # noqa: F401
from tmgcn_tpu.core.mmatrix import make_m_matrix  # noqa: F401
