"""Parallelism: device mesh + sharding rules (dp over DCN, tp over ICI)."""

from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    data_sharding,
    make_mesh,
    mesh_from_config,
    replicated,
)
from .sharding import (
    batch_pspecs,
    place_batch,
    place_params_lm,
    place_params_seq2seq,
    place_replicated,
    replicated_pspecs,
    seq2seq_pspecs,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "data_sharding",
    "make_mesh",
    "mesh_from_config",
    "replicated",
    "batch_pspecs",
    "place_batch",
    "place_params_lm",
    "place_params_seq2seq",
    "place_replicated",
    "replicated_pspecs",
    "seq2seq_pspecs",
]
