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
- optional GNMT-style length penalty and coverage penalty at finalization
  (the reference's ``onmt/Beam.py`` GlobalScorer penalties).

Token histories are **backpointer-based**, exactly like the reference's
``Beam.advance`` (``prevKs``): each step writes only this step's emitted
symbol ``sym[:, :, t]`` and parent index ``parent[:, :, t]`` — O(B*K) per
step — and full hypotheses are reconstructed ONCE at finalization by
:func:`reconstruct_tokens` (a reverse scan following the backpointers).
The previous design gathered the whole ``[B, K, t_max]`` token history by
parent every step, which made the per-step cost O(t_max) and measurably
cliffed the serving engine at large ``t_max`` (0.704x offline at
t_max=4096, BASELINE.md round 3).

The same ``step_beams`` core is reused by the continuous-batching engine
(:mod:`.engine`), which replaces the per-call encode with slot insertion
and reconstructs histories only for finished slots.
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

# Backpointers are stored as int8: beam widths are tiny (the fused top-k
# kernel caps k at 8; the reference used beam 5) and 127 is far beyond any
# realistic beam. int8 keeps the [B, K, T_max] buffer 4x smaller than the
# token buffer it sits next to.
PARENT_DTYPE = jnp.int8


class BeamState(NamedTuple):
    """Carry of the beam scan. Leading dims: [B, K] (state: [B*K, ...]).

    ``sym``/``parent`` are the backpointer history (reference
    ``onmt/Beam.py``: ``nextYs``/``prevKs``): ``sym[t, b*K + k]`` is the
    token beam slot ``k`` of sentence ``b`` emitted at step ``t`` and
    ``parent[t, b*K + k]`` the slot it extended. The history is stored
    TIME-MAJOR with the beam rows FLATTENED to one [B*K] minor dim: each
    step's write is one contiguous row (``sym.at[t]``), and B*K (640 at the
    serving shape) lane-aligns exactly — a trailing K=5 minor dim would be
    lane-padded 128/5 = 25x by the TPU layout. Slot histories are NOT kept
    in beam order — reconstruct with :func:`reconstruct_tokens`.
    """

    decoder_state: PyTree  # [B*K, ...] pytree
    sym: jnp.ndarray  # [T_max, B*K] emitted symbol per step (PAD-filled)
    parent: jnp.ndarray  # [T_max, B*K] int8 backpointers (identity-filled)
    last_token: jnp.ndarray  # [B, K]
    scores: jnp.ndarray  # [B, K] cumulative log-prob
    finished: jnp.ndarray  # [B, K] bool
    lengths: jnp.ndarray  # [B, K] emitted length (excl. EOS)
    # Accumulated attention over source positions [B, K, T_src]; present
    # (non-None) only when the caller enables the coverage penalty.
    coverage: Optional[jnp.ndarray] = None
    # Per-step attention HISTORY [T_max, B*K, T_src] (time-major like
    # sym/parent; backtraced by the same parent chain) — present only when
    # the caller asks for per-hypothesis attention (the reference
    # onmt/Translator.py returns it with the n-best list). Offline-path
    # feature: the serving engine never allocates it.
    attn: Optional[jnp.ndarray] = None


def init_beam_state(
    decoder_state: PyTree,
    batch: int,
    beam_size: int,
    t_max: int,
    *,
    bos_id: int = BOS,
    pad_id: int = PAD,
    coverage_len: Optional[int] = None,
    attn_len: Optional[int] = None,
) -> BeamState:
    """Fresh beam state: only beam 0 alive, histories PAD/identity-filled.
    ``attn_len`` (= T_src) allocates the per-step attention history for
    per-hypothesis attention output."""
    k = beam_size
    return BeamState(
        decoder_state=decoder_state,
        sym=jnp.full((t_max, batch * k), pad_id, jnp.int32),
        parent=jnp.tile(
            jnp.arange(k, dtype=PARENT_DTYPE), (t_max, batch)
        ),
        last_token=jnp.full((batch, k), bos_id, jnp.int32),
        # only beam 0 is alive at t=0 (all beams start identical)
        scores=jnp.tile(
            jnp.array([0.0] + [NEG_INF] * (k - 1), jnp.float32), (batch, 1)
        ),
        finished=jnp.zeros((batch, k), bool),
        lengths=jnp.zeros((batch, k), jnp.int32),
        coverage=(
            None
            if coverage_len is None
            else jnp.zeros((batch, k, coverage_len), jnp.float32)
        ),
        attn=(
            None
            if attn_len is None
            else jnp.zeros((t_max, batch * k, attn_len), jnp.float32)
        ),
    )


def reconstruct_tokens(
    sym: jnp.ndarray, parent: jnp.ndarray, beam_size: int
) -> jnp.ndarray:
    """Follow backpointers to materialize token histories.

    Inputs are TIME-MAJOR flat ``[T, B*K]`` (the storage layout); the
    result is ``[B, K, T]``. Row ``k`` is the full hypothesis of the beam
    currently in slot ``k`` (the reference's ``Beam.get_hyp``, vectorized):
    a reverse ``lax.scan`` walks ``t = T-1 .. 0`` carrying the slot index
    each beam occupied at that step. Unwritten positions (slots admitted
    mid-grid, or steps beyond a finished slot's depth) hold identity
    parents and PAD symbols, so they reconstruct to PAD — no masking
    needed.
    """
    t_max, rows = sym.shape
    k = beam_size
    b = rows // k
    sym3 = sym.reshape(t_max, b, k)
    par3 = parent.astype(jnp.int32).reshape(t_max, b, k)

    def step(cur, xs):
        s_t, p_t = xs  # [B, K]
        tok = jnp.take_along_axis(s_t, cur, axis=1)
        return jnp.take_along_axis(p_t, cur, axis=1), tok

    init = jnp.broadcast_to(jnp.arange(k)[None, :], (b, k))
    _, toks = jax.lax.scan(step, init, (sym3, par3), reverse=True)
    return jnp.moveaxis(toks, 0, 2)  # [B, K, T]


def reconstruct_attention(
    attn: jnp.ndarray, parent: jnp.ndarray, beam_size: int
) -> jnp.ndarray:
    """Backtrace per-step attention histories → ``[B, K, T, T_src]``.

    Same reverse parent walk as :func:`reconstruct_tokens`, gathering the
    stored ``[B*K, T_src]`` alignment row of whichever slot each final beam
    occupied at step ``t`` (the reference ``onmt/Translator.py`` builds the
    per-hypothesis attention list from ``Beam``'s recorded attentions the
    same way). Rows past a hypothesis' EOS are zeros (written that way)."""
    t_max, rows, t_src = attn.shape
    k = beam_size
    b = rows // k
    a4 = attn.reshape(t_max, b, k, t_src)
    par3 = parent.astype(jnp.int32).reshape(t_max, b, k)

    def step(cur, xs):
        a_t, p_t = xs  # [B, K, T_src], [B, K]
        row = jnp.take_along_axis(a_t, cur[:, :, None], axis=1)
        return jnp.take_along_axis(p_t, cur, axis=1), row

    init = jnp.broadcast_to(jnp.arange(k)[None, :], (b, k))
    _, rows_t = jax.lax.scan(step, init, (a4, par3), reverse=True)
    return jnp.moveaxis(rows_t, 0, 2)  # [B, K, T, T_src]


def unroll_ring(
    sym: jnp.ndarray,  # [T_ring, E*K] ring-buffer histories (time-major flat)
    parent: jnp.ndarray,  # [T_ring, E*K]
    start_pos: jnp.ndarray,  # [E] each slot's admission ring position
    t_len: jnp.ndarray,  # [E] each slot's decode depth
    *,
    beam_size: int,
    pad_id: int = PAD,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Align ring-buffer histories to step order for :func:`reconstruct_tokens`.

    The continuous-batching engine writes every slot's history at ONE shared
    scalar ring position per global inner step — a plain dynamic-update-
    slice of one contiguous [B, K] row, exactly like the offline path, with
    no per-slot scatter. A slot admitted at global step ``g0`` therefore
    owns the contiguous ring window ``[g0, g0 + t_len) mod T_ring``. This
    gathers that window into step order and masks everything outside it to
    PAD symbols / identity parents (other slots' epochs share the same
    rows), after which the standard backtrace applies. The ring must be
    deeper than ``max_tgt_len + (steps a finished slot can sit
    unextracted)`` — the engine allocates that headroom.
    """
    tp, rows = sym.shape
    k = beam_size
    e = rows // k
    sym3 = sym.reshape(tp, e, k)
    par3 = parent.astype(jnp.int32).reshape(tp, e, k)
    tpr = jnp.arange(tp)[:, None]  # [T_ring, 1]
    src = (start_pos[None, :] + tpr) % tp  # [T_ring, E]
    valid = tpr < t_len[None, :]  # [T_ring, E]
    sym_a = jnp.take_along_axis(sym3, src[:, :, None], axis=0)
    par_a = jnp.take_along_axis(par3, src[:, :, None], axis=0)
    ident = jnp.arange(k, dtype=jnp.int32)[None, None, :]
    sym_a = jnp.where(valid[:, :, None], sym_a, pad_id)
    par_a = jnp.where(valid[:, :, None], par_a, ident)
    return (
        sym_a.reshape(tp, e * k),
        par_a.astype(PARENT_DTYPE).reshape(tp, e * k),
    )


def _flatten_beams(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape((-1,) + x.shape[2:])


def _topk_small(x: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over a TINY trailing dim via k argmax+mask passes.

    Semantics match ``jax.lax.top_k`` exactly (values descending, ties
    broken by lowest index; tested). NOT used on the decode hot path: at
    the full decode step this variant measured +27us/step over lax.top_k
    at [B, 25] (BASELINE round 4) — the serial chain of cross-lane
    reductions loses to XLA's sort. Kept for host-side/one-off uses and as
    the documented negative result. Inputs must be > float32 min (true of
    scores/log-probs, which bottom out at NEG_INF = -1e9).
    """
    n = x.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    sentinel = jnp.finfo(jnp.float32).min
    vals, idxs = [], []
    cur = x
    for _ in range(k):
        mx = jnp.max(cur, axis=-1, keepdims=True)
        pos = jnp.min(jnp.where(cur == mx, iota, n), axis=-1, keepdims=True)
        vals.append(mx)
        idxs.append(pos)
        cur = jnp.where(iota == pos, sentinel, cur)
    return jnp.concatenate(vals, -1), jnp.concatenate(idxs, -1)


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


def coverage_penalty(coverage: jnp.ndarray, beta: float) -> jnp.ndarray:
    """GNMT coverage penalty ``beta * sum_j log(min(cov_j, 1))`` → [B, K].

    ``coverage`` [B, K, T_src] is the attention mass each hypothesis has
    accrued per source position (reference: ``onmt/Beam.py`` GlobalScorer /
    Wu et al. 2016 eq. 14). Positions with zero coverage are masked-out
    source padding (the attention softmax puts strictly positive mass on
    every real position), so they contribute 0 rather than -inf.
    """
    safe = jnp.where(coverage > 0, jnp.minimum(coverage, 1.0), 1.0)
    return beta * jnp.sum(jnp.log(safe), axis=-1)


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
    align: Optional[jnp.ndarray] = None,  # [B*K, T_src] pre-reorder attention
    probe: frozenset = frozenset(),
) -> BeamState:
    """Shared beam-advance tail: reorder by parent, record, track EOS/length.

    History recording is O(B*K): this step's symbol and backpointer go into
    column ``t`` via a scalar-indexed dynamic-update-slice — no gather of
    past steps (the reference's ``prevKs`` append). ``t`` is ALWAYS a
    scalar: offline decoding uses the scan counter; the continuous-batching
    engine uses a global ring position shared by every slot (each slot's
    history is a contiguous window of ring columns — see
    :func:`unroll_ring`), so the engine never needs per-slot scatter.

    ``probe`` is a PERF-PROBE ONLY knob (scripts/ab_bench.py): named tail
    components are skipped so their cost can be measured by interleaved
    A/B. Results are WRONG under any non-empty probe — never set it in
    production. Tokens: ``nogather`` skips the decoder-state reorder,
    ``nobook`` skips the history writes + EOS/length bookkeeping.
    """
    b, k = state.scores.shape
    if "nogather" not in probe:
        new_dec = _gather_beams(new_dec, parent, b, k)
    gather = jax.vmap(lambda a, i: a[i])
    finished = gather(state.finished, parent)
    lengths = gather(state.lengths, parent)
    align_g = None
    if align is not None and (
        state.coverage is not None or state.attn is not None
    ):
        # the parent's alignment this step, reordered with it
        align_g = gather(align.reshape(b, k, -1), parent)
    coverage = state.coverage
    if coverage is not None:
        coverage = gather(coverage, parent)
        if align_g is not None:
            # attention accrues only while the hypothesis is still emitting
            coverage = coverage + jnp.where(
                finished[..., None], 0.0, align_g.astype(coverage.dtype)
            )
    emit = jnp.where(finished, pad_id, token)
    t = jnp.asarray(t)
    if t.ndim != 0:
        raise ValueError(
            "history position t must be a scalar (engine slots share one "
            "ring position; per-slot windows are unrolled at extraction)"
        )
    if "nobook" in probe:  # perf probe: skip history writes + EOS/length
        return BeamState(
            decoder_state=new_dec, sym=state.sym, parent=state.parent,
            last_token=token, scores=new_scores, finished=finished,
            lengths=lengths, coverage=coverage, attn=state.attn,
        )
    # time-major flat: one contiguous lane-aligned [B*K] row per step
    sym = state.sym.at[t].set(emit.reshape(-1))
    par = state.parent.at[t].set(parent.astype(PARENT_DTYPE).reshape(-1))
    attn_hist = state.attn
    if attn_hist is not None:
        # per-step attention history (reference Translator's attn output):
        # rows past EOS store zeros, matching the PAD tokens they pair with
        row = jnp.where(finished[..., None], 0.0, align_g)
        attn_hist = attn_hist.at[t].set(row.reshape(b * k, -1))
    lengths = lengths + jnp.where(finished | (token == eos_id), 0, 1)
    finished = finished | (token == eos_id)
    return BeamState(
        decoder_state=new_dec,
        sym=sym,
        parent=par,
        last_token=token,
        scores=new_scores,
        finished=finished,
        lengths=lengths,
        coverage=coverage,
        attn=attn_hist,
    )


def step_beams(
    decode_step: Callable[[PyTree, jnp.ndarray], Tuple],
    state: BeamState,
    t: jnp.ndarray,
    *,
    beam_size: int,
    eos_id: int = EOS,
    pad_id: int = PAD,
) -> BeamState:
    """Advance every sentence's beams one step (the compiled Beam.advance).

    ``t`` is the scalar history-write position — the scan counter for
    lockstep (offline) decoding, or the shared ring position for the
    continuous-batching engine (see :func:`unroll_ring`).

    ``decode_step(state [B*K,...], tokens [B*K]) -> (state, logits [B*K, V])``
    — or ``(state, logits, align [B*K, T_src])`` when ``state.coverage`` is
    tracked (coverage-penalty decoding).
    """
    b, k = state.scores.shape
    ret = decode_step(state.decoder_state, _flatten_beams(state.last_token))
    if state.coverage is not None or state.attn is not None:
        new_dec, logits, align = ret
    else:
        (new_dec, logits), align = ret, None
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
        state, new_dec, new_scores, parent, token, t,
        eos_id=eos_id, pad_id=pad_id, align=align,
    )


def step_beams_cand(
    decode_cand: Callable[[PyTree, jnp.ndarray], Tuple],
    state: BeamState,
    t: jnp.ndarray,
    *,
    beam_size: int,
    eos_id: int = EOS,
    pad_id: int = PAD,
    probe: frozenset = frozenset(),
    combine: str = "xla",
) -> BeamState:
    """Beam advance from per-beam top-k CANDIDATES instead of full logits.

    ``combine`` selects the per-sentence top-k implementation: ``"xla"``
    (``lax.top_k`` + token take) or ``"pallas"``/``"interpret"`` (the
    one-launch fused kernel :func:`..kernels.beam_combine.beam_combine_topk`
    — bit-identical semantics incl. tie order).

    ``decode_cand(state, tokens [B*K]) -> (state, (vals [B*K, kc],
    idx [B*K, kc], lse [B*K, 1]))`` — the contract of the fused
    dequant+matmul+top-k kernel (:func:`..kernels.dequant_matmul_topk`),
    which never materializes the [B*K, V] logits; with coverage tracking it
    returns an extra ``align [B*K, T_src]``. Mathematically equivalent
    to :func:`step_beams` whenever kc >= beam_size: at most ``beam_size``
    winners can come from any single parent beam, so the per-beam top-k
    candidate set always contains the global top-k of ``scores + logp``.
    All bookkeeping here is on [B, K, kc] — a few thousand elements.
    """
    b, k = state.scores.shape
    ret = decode_cand(state.decoder_state, _flatten_beams(state.last_token))
    if state.coverage is not None or state.attn is not None:
        new_dec, (vals, idx, lse), align = ret
    else:
        (new_dec, (vals, idx, lse)), align = ret, None
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
    if "notopk" in probe:
        # perf probe (results WRONG): slot-0 continuation per beam, with a
        # data-dependent parent so XLA can't constant-fold the state
        # gather into an identity copy — measures the top_k + token-take
        # cost in isolation.
        new_scores = cand[..., 0]
        parent = jnp.abs(cand_tok[..., 0]) % k
        token = cand_tok[..., 0]
    elif combine != "xla":
        from ..kernels.beam_combine import beam_combine_topk

        new_scores, pos, token = beam_combine_topk(
            cand.reshape(b, k * kc), cand_tok.reshape(b, k * kc), beam_size,
            interpret=combine == "interpret",
        )
        parent = pos // kc
    else:
        # lax.top_k, NOT the tempting alternatives — both measured worse at
        # the full decode step: k-pass iterative argmax +27us/step (BASELINE
        # round 4); an inline tie-exact bitonic network on [B, 32]
        # −11.5us/step SLOWER than the sort custom-call (round-5 interleaved
        # A/B "btopk", 741.2k vs 794.3k tokens/s — the elementwise select
        # chain does not fuse into one pass the way it reads).
        new_scores, flat_idx = jax.lax.top_k(cand.reshape(b, k * kc), beam_size)
        parent = flat_idx // kc
        token = jnp.take_along_axis(
            cand_tok.reshape(b, k * kc), flat_idx, axis=1
        )
    return _advance(
        state, new_dec, new_scores, parent, token, t,
        eos_id=eos_id, pad_id=pad_id, align=align, probe=probe,
    )


def expand_to_beams(tree: PyTree, beam_size: int) -> PyTree:
    """[B, ...] pytree → [B*K, ...] by repeating each row K times."""
    return jax.tree.map(
        lambda t: jnp.repeat(t, beam_size, axis=0), tree
    )


def finalize_scores(state: BeamState, cfg: BeamConfig) -> jnp.ndarray:
    """Normalized hypothesis scores [B, K]: length + coverage penalties."""
    norm = state.scores / length_penalty(state.lengths, cfg.length_penalty)
    if cfg.coverage_penalty != 0.0:
        if state.coverage is None:
            raise ValueError(
                "coverage_penalty set but coverage was not tracked — pass "
                "coverage_len to beam_decode (offline paths do this when "
                "cfg.coverage_penalty != 0)"
            )
        norm = norm + coverage_penalty(state.coverage, cfg.coverage_penalty)
    return norm


def beam_decode(
    decode_step: Callable[[PyTree, jnp.ndarray], Tuple],
    dec_state_beams: PyTree,
    batch: int,
    cfg: BeamConfig,
    *,
    bos_id: int = BOS,
    eos_id: int = EOS,
    pad_id: int = PAD,
    candidates: bool = False,
    coverage_len: Optional[int] = None,
    return_attention: bool = False,
    probe: frozenset = frozenset(),
    combine: str = "xla",
) -> Tuple[jnp.ndarray, ...]:
    """Backend-agnostic beam core: scan ``max_len`` steps over any decoder.

    ``decode_step(state [B*K,...], tokens [B*K]) -> (state, logits [B*K, V])``
    may be the flax module path or the packed-kernel inference path
    (:mod:`.infer`) — the beam bookkeeping is identical. With
    ``candidates=True`` the decoder returns per-beam top-k candidates
    ``(vals, idx, lse)`` instead of logits (fused-kernel serving path).
    When ``cfg.coverage_penalty`` is set OR ``return_attention`` is on, pass
    ``coverage_len`` (= T_src) and a decode_step that returns an extra
    ``align [B*K, T_src]``.

    Returns the best hypothesis per sentence — ``(tokens [B, T], score [B])``
    — when ``cfg.n_best == 1``, or the top ``n_best`` hypotheses sorted by
    normalized score — ``(tokens [B, n_best, T], scores [B, n_best])`` — when
    ``cfg.n_best > 1`` (the reference's ``onmt/Translator.py`` n-best list).
    With ``return_attention`` a third element carries each returned
    hypothesis' per-step source attention — ``[B, T, T_src]`` /
    ``[B, n_best, T, T_src]`` (the reference Translator's ``attn`` output).
    """
    if not (1 <= cfg.n_best <= cfg.beam_size):
        raise ValueError(
            f"n_best={cfg.n_best} must be in [1, beam_size={cfg.beam_size}]"
        )
    if cfg.coverage_penalty != 0.0 and coverage_len is None:
        raise ValueError("cfg.coverage_penalty requires coverage_len (T_src)")
    if return_attention and coverage_len is None:
        raise ValueError("return_attention requires coverage_len (T_src)")
    k = cfg.beam_size
    init = init_beam_state(
        dec_state_beams, batch, k, cfg.max_len,
        bos_id=bos_id, pad_id=pad_id,
        coverage_len=coverage_len if cfg.coverage_penalty != 0.0 else None,
        attn_len=coverage_len if return_attention else None,
    )

    stepper = step_beams_cand if candidates else step_beams
    extra = {}
    if candidates and probe:
        extra["probe"] = probe
    if candidates and combine != "xla":
        extra["combine"] = combine

    def scan_body(state, t):
        return (
            stepper(
                decode_step, state, t, beam_size=k, eos_id=eos_id,
                pad_id=pad_id, **extra,
            ),
            None,
        )

    final, _ = jax.lax.scan(scan_body, init, jnp.arange(cfg.max_len))
    norm = finalize_scores(final, cfg)
    tokens = reconstruct_tokens(final.sym, final.parent, k)
    attn = (
        reconstruct_attention(final.attn, final.parent, k)
        if return_attention
        else None
    )
    take = jax.vmap(lambda a, i: a[i])
    if cfg.n_best == 1:
        best = jnp.argmax(norm, axis=1)  # [B]
        out = (take(tokens, best), take(norm, best))
        return out + ((take(attn, best),) if attn is not None else ())
    top_scores, order = jax.lax.top_k(norm, cfg.n_best)  # [B, n]
    out = (take(tokens, order), top_scores)
    return out + ((take(attn, order),) if attn is not None else ())


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
    return_attention: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Translate a batch: → (best tokens [B, max_len], best scores [B]).

    Encode once per sentence, expand encoder outputs across beams, then scan
    ``max_len`` decode steps (reference hot loop 3.4, now one XLA program).
    ``return_attention`` appends each hypothesis' per-step source attention
    (reference ``onmt/Translator.py`` attn output) — see :func:`beam_decode`.
    """
    b = src.shape[0]
    k = cfg.beam_size
    enc_out, enc_mask, dec_state = model.apply(
        variables, src, src_len, method=model.encode
    )
    enc_out_b = jnp.repeat(enc_out, k, axis=0)
    enc_mask_b = jnp.repeat(enc_mask, k, axis=0)
    dec_state_b = expand_to_beams(dec_state, k)

    if cfg.coverage_penalty != 0.0 or return_attention:

        def decode_step(state, tokens):
            return model.apply(
                variables, state, tokens, enc_out_b, enc_mask_b,
                method=model.decode_step_attn,
            )

    else:

        def decode_step(state, tokens):
            return model.apply(
                variables, state, tokens, enc_out_b, enc_mask_b,
                method=model.decode_step,
            )

    return beam_decode(
        decode_step, dec_state_b, b, cfg,
        bos_id=bos_id, eos_id=eos_id, pad_id=pad_id,
        coverage_len=enc_out.shape[1],
        return_attention=return_attention,
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
