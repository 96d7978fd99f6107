"""Utilities: BLEU scoring, metrics logging, profiling helpers."""

from .bleu import corpus_bleu, detok_bleu, tokenize_13a

__all__ = ["corpus_bleu", "detok_bleu", "tokenize_13a"]
