"""Device-mesh construction.

The reference is strictly single-device (SURVEY.md §2: no torch.distributed,
no NCCL/MPI). All multi-chip capability here is new, built the TPU way: a
``jax.sharding.Mesh`` with a ``data`` axis (mapped onto DCN between hosts)
and a ``model`` axis (mapped onto ICI within a slice); parallelism is
expressed as shardings and XLA inserts/overlaps the collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Mesh with ``data`` as the outer (DCN-friendly) axis and ``model`` as
    the inner (ICI) axis.

    jax.make_mesh orders later axes fastest-varying over the device list, so
    the ``model`` axis lands on adjacent devices — ICI neighbors on a real
    slice — which is where the latency-sensitive tensor-parallel collectives
    must ride (SURVEY.md §5 comm-backend row).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def mesh_from_config(cfg: MeshConfig, devices=None) -> Mesh:
    return make_mesh(cfg.data, cfg.model, devices)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, PartitionSpec(DATA_AXIS))
