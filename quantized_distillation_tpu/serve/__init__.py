"""Serving: compiled beam search, packed inference, continuous batching,
and mesh-sharded (slot-DP × vocab-TP) deployment.

Covers (and supersedes) the reference's ``onmt/Translator.py`` /
``onmt/Beam.py`` offline decode loop.
"""

from .beam import (
    BeamState,
    beam_search,
    coverage_penalty,
    expand_to_beams,
    greedy_decode,
    init_beam_state,
    length_penalty,
    reconstruct_attention,
    reconstruct_tokens,
    step_beams,
    step_beams_cand,
    tokens_to_sentences,
    unroll_ring,
)
from .engine import Completion, TranslationEngine
from .infer import PackedDecoder, beam_search_packed, pack_decoder
from .sharded import (
    beam_search_sharded,
    make_sharded_decode_step_topk,
    pack_generator_sharded,
    shard_decoder,
)

__all__ = [
    "BeamState",
    "beam_search",
    "coverage_penalty",
    "expand_to_beams",
    "greedy_decode",
    "init_beam_state",
    "length_penalty",
    "reconstruct_attention",
    "reconstruct_tokens",
    "step_beams",
    "step_beams_cand",
    "tokens_to_sentences",
    "unroll_ring",
    "Completion",
    "TranslationEngine",
    "PackedDecoder",
    "beam_search_packed",
    "pack_decoder",
    "beam_search_sharded",
    "make_sharded_decode_step_topk",
    "pack_generator_sharded",
    "shard_decoder",
]
