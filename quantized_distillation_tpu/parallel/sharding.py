"""Sharding rules: partition specs for parameters, state, and batches.

Tensor-parallel layout for the seq2seq family (the north-star's "decoder
state tensor-sharded" requirement), chosen so per-step collectives ride ICI:

- embeddings: rows (vocab) sharded over ``model`` — the gather for a token
  batch hits one shard, XLA all-gathers the small [B, E] result;
- LSTM gate kernels (``ii/if/ig/io``, ``hi/hf/hg/ho``): output (gate) dim
  sharded → each device computes its slice of every gate; (c, h) are then
  hidden-sharded, elementwise gate math is local, and only the recurrent
  matmul input needs an all-gather of the small [B, H] hidden;
- attention ``linear_in``/``linear_out``: column-sharded (same H slicing);
- generator kernel [H, V]: vocab-column-sharded — the big serving matmul —
  followed by per-shard top-k + global merge in the beam engine;
- everything else (biases, norm, batch stats): replicated.

Vision models train pure-DP (they are small); their params replicate.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS

PyTree = Any

# (path regex, rank) → PartitionSpec. First match wins.
_SEQ2SEQ_RULES = [
    (r"embedding$", lambda r: P(MODEL_AXIS, None)),
    (r"generator/kernel$", lambda r: P(None, MODEL_AXIS)),
    (r"generator/bias$", lambda r: P(MODEL_AXIS)),
    (r"(ii|if|ig|io|hi|hf|hg|ho)/kernel$", lambda r: P(None, MODEL_AXIS)),
    (r"(hi|hf|hg|ho)/bias$", lambda r: P(MODEL_AXIS)),
    (r"attn/linear_(in|out)/kernel$", lambda r: P(None, MODEL_AXIS)),
]


def _path_str(path) -> str:
    return "/".join(
        str(getattr(p, "key", getattr(p, "idx", p))) for p in path
    )


def seq2seq_pspecs(params: PyTree) -> PyTree:
    """PartitionSpec tree for seq2seq params (tp over the model axis)."""

    def rule(path, leaf):
        p = _path_str(path)
        for pat, spec in _SEQ2SEQ_RULES:
            if re.search(pat, p):
                return spec(leaf.ndim)
        return P()

    return jax.tree_util.tree_map_with_path(rule, params)


def replicated_pspecs(params: PyTree) -> PyTree:
    return jax.tree.map(lambda _: P(), params)


def batch_pspecs(batch: Dict) -> Dict:
    """Shard every batch array along its leading (batch) axis."""
    return jax.tree.map(lambda x: P(DATA_AXIS), batch)


def to_named(tree_pspecs: PyTree, mesh: Mesh) -> PyTree:
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        tree_pspecs,
        is_leaf=lambda x: isinstance(x, P),
    )


def place(tree: PyTree, pspecs: PyTree, mesh: Mesh) -> PyTree:
    """device_put a pytree according to a PartitionSpec tree."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        tree,
        pspecs,
        is_leaf=lambda x: isinstance(x, P) or not isinstance(x, (dict, list, tuple)),
    )


def place_replicated(tree: PyTree, mesh: Mesh) -> PyTree:
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def place_batch(batch: Dict, mesh: Mesh) -> Dict:
    s = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def place_params_seq2seq(params: PyTree, mesh: Mesh) -> PyTree:
    """device_put seq2seq params with tensor-parallel shardings.

    Leaves whose sharded dim doesn't divide the mesh axis fall back to
    replication (e.g. odd vocab sizes in tests).

    The rules are LSTM-family-generic (embedding rows, LSTM gate columns,
    generator vocab columns), so they shard the language model
    (``models/lm.py``) identically — ``place_params_lm`` below is the same
    placement under the family's name.
    """

    def put(path, leaf):
        p = _path_str(path)
        spec = P()
        for pat, fn in _SEQ2SEQ_RULES:
            if re.search(pat, p):
                cand = fn(leaf.ndim)
                ok = True
                for dim, name in enumerate(cand):
                    if name is None:
                        continue
                    axis = mesh.shape[name]
                    if dim >= leaf.ndim or leaf.shape[dim] % axis:
                        ok = False
                if ok:
                    spec = cand
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)


# LSTM LM shares the gate/embedding/generator structure — same placement.
place_params_lm = place_params_seq2seq
