"""Serving: compiled beam search and the continuous-batching engine.

Covers (and supersedes) the reference's ``onmt/Translator.py`` /
``onmt/Beam.py`` offline decode loop.
"""

from .beam import (
    BeamState,
    beam_search,
    expand_to_beams,
    greedy_decode,
    length_penalty,
    step_beams,
    step_beams_cand,
    tokens_to_sentences,
)

__all__ = [
    "BeamState",
    "beam_search",
    "expand_to_beams",
    "greedy_decode",
    "length_penalty",
    "step_beams",
    "step_beams_cand",
    "tokens_to_sentences",
]
