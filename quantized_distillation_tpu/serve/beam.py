"""Batched beam-search decoding as one compiled ``lax.scan``.

Re-designs the reference's inference engine (``onmt/Translator.py`` +
``onmt/Beam.py``): where the reference advances ``beam_size`` hypotheses per
sentence in a *Python* loop over time steps (top-k over the vocab,
backpointers, EOS bookkeeping per ``Beam.advance``), here the entire decode
is a single jitted ``lax.scan`` with static shapes:

- all B sentences x K beams step together: one ``decode_step`` on a
  ``[B*K]`` batch per time step (one big MXU matmul instead of K small ones),
- top-k over ``K*V`` flattened candidates per sentence via ``jax.lax.top_k``,
- beam reordering is a gather on the decoder-state pytree (the "KV-cache"
  analog: LSTM (c, h) per layer + input feed),
- finished beams are masked to emit only EOS with zero added score,
- optional GNMT-style length penalty at finalization.

The same ``step_beams`` core is reused by the continuous-batching engine
(:mod:`.engine`), which replaces the per-call encode with slot insertion.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import BeamConfig
from ..data.translation import BOS, EOS, PAD

PyTree = Any

NEG_INF = -1e9


class BeamState(NamedTuple):
    """Carry of the beam scan. Leading dims: [B, K] (state: [B*K, ...])."""

    decoder_state: PyTree  # [B*K, ...] pytree
    tokens: jnp.ndarray  # [B, K, T_max] emitted tokens (PAD-filled)
    last_token: jnp.ndarray  # [B, K]
    scores: jnp.ndarray  # [B, K] cumulative log-prob
    finished: jnp.ndarray  # [B, K] bool
    lengths: jnp.ndarray  # [B, K] emitted length (excl. EOS)


def _flatten_beams(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape((-1,) + x.shape[2:])


def _gather_beams(tree: PyTree, parent: jnp.ndarray, batch: int, k: int) -> PyTree:
    """Reorder a [B*K, ...] pytree by per-sentence parent beam indices [B,K]."""
    base = jnp.arange(batch)[:, None] * k
    flat_idx = (base + parent).reshape(-1)  # [B*K]
    return jax.tree.map(lambda t: t[flat_idx], tree)


def length_penalty(lengths: jnp.ndarray, alpha: float) -> jnp.ndarray:
    """GNMT length normalization ((5+len)/6)^alpha; 1 when alpha == 0."""
    if alpha == 0.0:
        return jnp.ones_like(lengths, jnp.float32)
    return jnp.power((5.0 + lengths.astype(jnp.float32)) / 6.0, alpha)


def _advance(
    state: BeamState,
    new_dec: PyTree,
    new_scores: jnp.ndarray,  # [B, K]
    parent: jnp.ndarray,  # [B, K]
    token: jnp.ndarray,  # [B, K]
    t: jnp.ndarray,
    *,
    eos_id: int,
    pad_id: int,
) -> BeamState:
    """Shared beam-advance tail: reorder by parent, emit, track EOS/length."""
    b, k = state.scores.shape
    new_dec = _gather_beams(new_dec, parent, b, k)
    gather = jax.vmap(lambda a, i: a[i])
    tokens = gather(state.tokens, parent)
    finished = gather(state.finished, parent)
    lengths = gather(state.lengths, parent)
    emit = jnp.where(finished, pad_id, token)
    t = jnp.asarray(t)
    if t.ndim == 0:
        tokens = tokens.at[:, :, t].set(emit)
    else:
        # per-slot positions: one-hot masked write over the time axis
        t_max = tokens.shape[2]
        pos = jnp.arange(t_max)[None, None, :] == t[:, None, None]  # [B,1,T]
        tokens = jnp.where(pos, emit[:, :, None], tokens)
    lengths = lengths + jnp.where(finished | (token == eos_id), 0, 1)
    finished = finished | (token == eos_id)
    return BeamState(
        decoder_state=new_dec,
        tokens=tokens,
        last_token=token,
        scores=new_scores,
        finished=finished,
        lengths=lengths,
    )


def step_beams(
    decode_step: Callable[[PyTree, jnp.ndarray], Tuple[PyTree, jnp.ndarray]],
    state: BeamState,
    t: jnp.ndarray,
    *,
    beam_size: int,
    eos_id: int = EOS,
    pad_id: int = PAD,
) -> BeamState:
    """Advance every sentence's beams one step (the compiled Beam.advance).

    ``t`` is the emit position — a scalar for lockstep (offline) decoding, or
    a per-sentence ``[B]`` vector for the continuous-batching engine, where
    every slot sits at its own depth.
    """
    b, k = state.scores.shape
    new_dec, logits = decode_step(state.decoder_state, _flatten_beams(state.last_token))
    v = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1).reshape(b, k, v)
    # Finished beams: only continuation is EOS at zero added score, so their
    # cumulative score is frozen and they stay comparable with live beams.
    eos_row = jnp.full((v,), NEG_INF).at[eos_id].set(0.0)
    logp = jnp.where(state.finished[..., None], eos_row[None, None, :], logp)
    cand = state.scores[..., None] + logp  # [B, K, V]
    flat = cand.reshape(b, k * v)
    new_scores, flat_idx = jax.lax.top_k(flat, beam_size)  # [B, K]
    parent = flat_idx // v
    token = flat_idx % v
    return _advance(
        state, new_dec, new_scores, parent, token, t, eos_id=eos_id, pad_id=pad_id
    )


def step_beams_cand(
    decode_cand: Callable[
        [PyTree, jnp.ndarray],
        Tuple[PyTree, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    ],
    state: BeamState,
    t: jnp.ndarray,
    *,
    beam_size: int,
    eos_id: int = EOS,
    pad_id: int = PAD,
) -> BeamState:
    """Beam advance from per-beam top-k CANDIDATES instead of full logits.

    ``decode_cand(state, tokens [B*K]) -> (state, (vals [B*K, kc],
    idx [B*K, kc], lse [B*K, 1]))`` — the contract of the fused
    dequant+matmul+top-k kernel (:func:`..kernels.dequant_matmul_topk`),
    which never materializes the [B*K, V] logits. Mathematically equivalent
    to :func:`step_beams` whenever kc >= beam_size: at most ``beam_size``
    winners can come from any single parent beam, so the per-beam top-k
    candidate set always contains the global top-k of ``scores + logp``.
    All bookkeeping here is on [B, K, kc] — a few thousand elements.
    """
    b, k = state.scores.shape
    new_dec, (vals, idx, lse) = decode_cand(
        state.decoder_state, _flatten_beams(state.last_token)
    )
    kc = vals.shape[-1]
    logp = (vals - lse).reshape(b, k, kc)
    cand_tok = idx.reshape(b, k, kc)
    # Finished beams: single EOS continuation at zero added score.
    slot0 = jnp.arange(kc) == 0
    fin_logp = jnp.where(slot0, 0.0, NEG_INF)
    fin = state.finished[..., None]
    logp = jnp.where(fin, fin_logp, logp)
    cand_tok = jnp.where(fin, eos_id, cand_tok)
    cand = state.scores[..., None] + logp  # [B, K, kc]
    new_scores, flat_idx = jax.lax.top_k(cand.reshape(b, k * kc), beam_size)
    parent = flat_idx // kc
    token = jax.vmap(lambda tk, i: tk.reshape(-1)[i])(cand_tok, flat_idx)
    return _advance(
        state, new_dec, new_scores, parent, token, t, eos_id=eos_id, pad_id=pad_id
    )


def expand_to_beams(tree: PyTree, beam_size: int) -> PyTree:
    """[B, ...] pytree → [B*K, ...] by repeating each row K times."""
    return jax.tree.map(
        lambda t: jnp.repeat(t, beam_size, axis=0), tree
    )


def beam_decode(
    decode_step: Callable[[PyTree, jnp.ndarray], Tuple[PyTree, jnp.ndarray]],
    dec_state_beams: PyTree,
    batch: int,
    cfg: BeamConfig,
    *,
    bos_id: int = BOS,
    eos_id: int = EOS,
    pad_id: int = PAD,
    candidates: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Backend-agnostic beam core: scan ``max_len`` steps over any decoder.

    ``decode_step(state [B*K,...], tokens [B*K]) -> (state, logits [B*K, V])``
    may be the flax module path or the packed-kernel inference path
    (:mod:`.infer`) — the beam bookkeeping is identical. With
    ``candidates=True`` the decoder returns per-beam top-k candidates
    ``(vals, idx, lse)`` instead of logits (fused-kernel serving path).

    Returns the best hypothesis per sentence — ``(tokens [B, T], score [B])``
    — when ``cfg.n_best == 1``, or the top ``n_best`` hypotheses sorted by
    normalized score — ``(tokens [B, n_best, T], scores [B, n_best])`` — when
    ``cfg.n_best > 1`` (the reference's ``onmt/Translator.py`` n-best list).
    """
    if not (1 <= cfg.n_best <= cfg.beam_size):
        raise ValueError(
            f"n_best={cfg.n_best} must be in [1, beam_size={cfg.beam_size}]"
        )
    k = cfg.beam_size
    init = BeamState(
        decoder_state=dec_state_beams,
        tokens=jnp.full((batch, k, cfg.max_len), pad_id, jnp.int32),
        last_token=jnp.full((batch, k), bos_id, jnp.int32),
        # only beam 0 is alive at t=0 (all beams start identical)
        scores=jnp.tile(
            jnp.array([0.0] + [NEG_INF] * (k - 1), jnp.float32), (batch, 1)
        ),
        finished=jnp.zeros((batch, k), bool),
        lengths=jnp.zeros((batch, k), jnp.int32),
    )

    stepper = step_beams_cand if candidates else step_beams

    def scan_body(state, t):
        return (
            stepper(
                decode_step, state, t, beam_size=k, eos_id=eos_id, pad_id=pad_id
            ),
            None,
        )

    final, _ = jax.lax.scan(scan_body, init, jnp.arange(cfg.max_len))
    norm = final.scores / length_penalty(final.lengths, cfg.length_penalty)
    take = jax.vmap(lambda a, i: a[i])
    if cfg.n_best == 1:
        best = jnp.argmax(norm, axis=1)  # [B]
        return take(final.tokens, best), take(norm, best)
    top_scores, order = jax.lax.top_k(norm, cfg.n_best)  # [B, n]
    return take(final.tokens, order), top_scores


def beam_search(
    model,
    variables: PyTree,
    src: jnp.ndarray,
    src_len: jnp.ndarray,
    cfg: BeamConfig,
    *,
    bos_id: int = BOS,
    eos_id: int = EOS,
    pad_id: int = PAD,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Translate a batch: → (best tokens [B, max_len], best scores [B]).

    Encode once per sentence, expand encoder outputs across beams, then scan
    ``max_len`` decode steps (reference hot loop 3.4, now one XLA program).
    """
    b = src.shape[0]
    k = cfg.beam_size
    enc_out, enc_mask, dec_state = model.apply(
        variables, src, src_len, method=model.encode
    )
    enc_out_b = jnp.repeat(enc_out, k, axis=0)
    enc_mask_b = jnp.repeat(enc_mask, k, axis=0)
    dec_state_b = expand_to_beams(dec_state, k)

    def decode_step(state, tokens):
        return model.apply(
            variables, state, tokens, enc_out_b, enc_mask_b,
            method=model.decode_step,
        )

    return beam_decode(
        decode_step, dec_state_b, b, cfg,
        bos_id=bos_id, eos_id=eos_id, pad_id=pad_id,
    )


def greedy_decode(
    model,
    variables: PyTree,
    src: jnp.ndarray,
    src_len: jnp.ndarray,
    max_len: int,
    *,
    bos_id: int = BOS,
    eos_id: int = EOS,
    pad_id: int = PAD,
) -> jnp.ndarray:
    """Greedy decoding = beam_size 1, kept separate for the fast path."""
    cfg = BeamConfig(beam_size=1, max_len=max_len)
    tokens, _ = beam_search(
        model, variables, src, src_len, cfg,
        bos_id=bos_id, eos_id=eos_id, pad_id=pad_id,
    )
    return tokens


def tokens_to_sentences(tokens, vocab, eos_id: int = EOS) -> list:
    """[B, T] int array → list of token-string lists (host-side)."""
    import numpy as np

    out = []
    for row in np.asarray(tokens):
        sent = []
        for tok in row:
            if tok == eos_id:
                break
            sent.append(int(tok))
        out.append(vocab.decode(sent))
    return out
