"""Fused beam-combine kernel: top-k of [B, K*kc] candidates in ONE launch.

The beam core's per-sentence combine (``serve.beam.step_beams_cand``) is
``lax.top_k`` over the tiny [B, k*kc] candidate matrix plus a token
``take_along_axis`` — measured **9.0 µs/step** at the serving shape
(M=640 → [128, 25]; interleaved ``notopk`` probe, BASELINE round 5): the
sort custom-call plus its neighbors cost far more in dispatch than in
VPU work. Two XLA-level replacements measured WORSE (k-pass argmax
+27 µs round 4; tie-exact bitonic network −11.5 µs round 5), so the
remaining move is structural: do the whole selection in one Pallas
launch — k masked-argmax passes over a [B, 128]-padded VMEM tile, each a
handful of VPU ops, with the winner's token gathered in the same kernel.

Tie semantics are IDENTICAL to ``jax.lax.top_k`` (values descending,
equal values by ascending candidate index): each pass takes the max and,
among equal maxima, the lowest lane, then masks that lane out. The jax
fallback (CPU / ``use_pallas=False``) is literally ``lax.top_k`` +
``take_along_axis``, so every platform agrees bit-for-bit.

Reference analog: the per-sentence ``Beam.advance`` top-k over
``K*V`` flattened candidates (reconstructed ``onmt/Beam.py``; SURVEY
§3.4) — here over the fused generator kernel's per-beam survivors.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANES = 128
# Sentinel strictly below any live candidate score. Beam scores bottom out
# around NEG_INF (-1e9) plus a log-prob; -1e30 clears that by 20 orders
# while staying far from f32 overflow when compared/selected.
_PAD_VAL = -1e30


def _combine_kernel(cand_ref, tok_ref, vals_ref, pos_ref, toks_ref, *, k: int, n: int):
    cand = cand_ref[...]  # [B, LANES] f32, lanes >= n padded with _PAD_VAL
    toks = tok_ref[...]  # [B, LANES] i32
    lane = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 1)
    out_v = jnp.full_like(cand, _PAD_VAL)
    out_p = jnp.zeros_like(toks)
    out_t = jnp.zeros_like(toks)
    for j in range(k):
        m = jnp.max(cand, axis=1, keepdims=True)  # [B, 1]
        hit = cand == m
        pos = jnp.min(jnp.where(hit, lane, LANES), axis=1, keepdims=True)
        sel = lane == pos  # exactly one lane per row
        tok = jnp.sum(jnp.where(sel, toks, 0), axis=1, keepdims=True)
        put = lane == j
        out_v = jnp.where(put, m, out_v)
        out_p = jnp.where(put, pos, out_p)
        out_t = jnp.where(put, tok, out_t)
        cand = jnp.where(sel, _PAD_VAL, cand)
    vals_ref[...] = out_v
    pos_ref[...] = out_p
    toks_ref[...] = out_t


def beam_combine_topk(
    cand: jnp.ndarray,  # [B, n] candidate scores (any n <= LANES)
    cand_tok: jnp.ndarray,  # [B, n] int32 tokens
    k: int,
    *,
    use_pallas: bool = True,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """→ ``(scores [B, k], pos [B, k], token [B, k])``, exactly
    ``lax.top_k(cand, k)`` plus the winners' tokens (ties: lowest index).
    ``pos`` indexes into the flattened candidate dim (caller derives the
    parent beam as ``pos // kc``)."""
    b, n = cand.shape
    if k > n:
        raise ValueError(f"k={k} > candidate count {n}")
    if not use_pallas or n > LANES:
        vals, pos = jax.lax.top_k(cand, k)
        return vals, pos, jnp.take_along_axis(cand_tok, pos, axis=1)
    pad = LANES - n
    cand_p = jnp.pad(cand.astype(jnp.float32), ((0, 0), (0, pad)),
                     constant_values=_PAD_VAL)
    tok_p = jnp.pad(cand_tok.astype(jnp.int32), ((0, 0), (0, pad)))
    vals, pos, toks = pl.pallas_call(
        partial(_combine_kernel, k=k, n=n),
        out_shape=(
            jax.ShapeDtypeStruct((b, LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, LANES), jnp.int32),
            jax.ShapeDtypeStruct((b, LANES), jnp.int32),
        ),
        interpret=interpret,
    )(cand_p, tok_p)
    return vals[:, :k], pos[:, :k], toks[:, :k]
