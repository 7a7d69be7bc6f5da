"""Device mesh + sharding helpers for data-parallel training.

The reference's only parallelism is data parallelism over NCCL DDP
(`tools/dist_train.sh`, `MMDistributedDataParallel`; SURVEY.md §2.3). The
TPU-native equivalent: a 1-D `Mesh(('data',))`, batch arrays sharded on
axis 0, parameters replicated, and XLA inserting the gradient/statistics
all-reduces over ICI automatically inside the jitted train step. Loss
normalizers computed as *global batch* means reproduce the reference's
`reduce_mean` cross-rank averaging, and masked global BatchNorm statistics
subsume `NaiveSyncBatchNorm` (`mmdet3d/ops/norm.py`).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(devices, ("data",))


def shard_batch(mesh: Mesh) -> NamedSharding:
    """Sharding for batch-leading arrays: split axis 0 over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
