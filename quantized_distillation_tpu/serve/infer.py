"""Packed-weight inference engine for the seq2seq family.

Converts trained flax :class:`..models.seq2seq.Seq2Seq` parameters into the
deployment form the north-star describes — packed INT2/4/8 weights resident
in HBM, dequantization fused into every decoder matmul via the Pallas kernels
(:mod:`..kernels`) — and provides a functional ``decode_step`` that the beam
engine (:func:`.beam.beam_decode`) and the continuous-batching server drive.

What changes vs the flax decode path (and why it's faster):

- The four-gate, input+recurrent LSTM matmuls of each layer fuse into ONE
  packed [E_in + H, 4H] matrix per cell — one kernel launch per layer per
  step instead of eight small dense matmuls.
- Attention keys ``enc_out @ W_a`` are precomputed once per sentence at
  encode time (the flax scan recomputes them per step and hopes LICM saves
  it).
- The generator [H, V] — the dominant matmul at WMT vocab sizes — reads
  int4/int2 weights straight from HBM through the fused kernel: bits/32 of
  the FP32 HBM traffic.
- Everything is a pure function of an explicit :class:`PackedDecoder` pytree;
  the decoder state is the same ``DecoderState`` the sharding rules cover.

The encoder stays in dense bf16 flax (it runs once per sentence, outside the
serving hot loop); ``encode_packed`` wraps it and emits the precomputed keys.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..config import BeamConfig
from ..kernels import PackedLinear, dequant_matmul, pack_linear
from ..kernels.topk_fused import KMAX, dequant_matmul_topk
from ..models.seq2seq import DecoderState, Seq2SeqConfig
from .beam import beam_decode, expand_to_beams

PyTree = Any


class FusedDecState(struct.PyTreeNode):
    """Serving-side decoder state fused into TWO row-major buffers.

    The per-step beam reorder (``beam._gather_beams``) is the largest
    non-generator item of the decode step; as 2L+1 separate per-leaf
    gathers it measured 14.7 µs/step at the serving shape (M=640, H=256,
    L=2 — interleaved ``nogather`` probe, BASELINE round 5) moving only
    ~4.6 MB r+w, i.e. ~40% of HBM peak. Fusing the state into two
    contiguous buffers makes the reorder two wide-row gathers (2 KB f32 /
    1.5 KB bf16 rows) that stream at bandwidth. Column blocks are
    layer-major: ``c = [c_0 | c_1 | ...]`` (f32 — cell state accumulates
    across steps), ``hf = [h_0 | h_1 | ... | input_feed]`` (compute
    dtype — these only ever feed compute-dtype matmuls). Slice reads in
    ``_decode_body`` are lane-aligned for every preset (H a multiple of
    128) and free; the rebuild concats fuse into the producing cell math.
    """

    c: jnp.ndarray  # [M, L*H] float32
    hf: jnp.ndarray  # [M, (L+1)*H] compute dtype


def fuse_dec_state(state: DecoderState, compute_dtype) -> FusedDecState:
    """Nested-tuple flax ``DecoderState`` → :class:`FusedDecState`."""
    states, input_feed = state
    c = jnp.concatenate([c for c, _ in states], axis=-1).astype(jnp.float32)
    hf = jnp.concatenate(
        [h.astype(compute_dtype) for _, h in states]
        + [input_feed.astype(compute_dtype)],
        axis=-1,
    )
    return FusedDecState(c=c, hf=hf)


def unfuse_dec_state(
    state: FusedDecState, num_layers: int, hidden: int
) -> DecoderState:
    """:class:`FusedDecState` → nested-tuple flax ``DecoderState``."""
    states = tuple(
        (
            state.c[:, i * hidden:(i + 1) * hidden],
            state.hf[:, i * hidden:(i + 1) * hidden],
        )
        for i in range(num_layers)
    )
    return states, state.hf[:, num_layers * hidden:]


class PackedLSTMCell(struct.PyTreeNode):
    """Fused [x;h] → gates matrix: [E_in + H, 4H] packed, gate order i,f,g,o
    (flax OptimizedLSTMCell convention: kernels ``ii/if/ig/io``+``hi/..``)."""

    w: PackedLinear
    bias: jnp.ndarray  # [4H]


class PackedDecoder(struct.PyTreeNode):
    """All decoder-side weights in deployment form."""

    tgt_embed: jnp.ndarray  # [V_tgt, E] bf16 (gather, not matmul — stays dense)
    cells: Tuple[PackedLSTMCell, ...]
    attn_in: Optional[jnp.ndarray]  # [H, H] bf16 key projection (None = dot attn)
    attn_out: PackedLinear  # [2H, H]
    generator: PackedLinear  # [H, V_tgt] + bias
    hidden: int = struct.field(pytree_node=False)
    compute_dtype: Any = struct.field(pytree_node=False, default=jnp.bfloat16)
    use_pallas: bool = struct.field(pytree_node=False, default=True)
    # per-lane-class survivors in the fused top-k generator kernel:
    # 2 = fastest (collisions certifiable, see kernels.topk_fused),
    # >= beam_size = mathematically exact for any logits
    topk_slots: int = struct.field(pytree_node=False, default=2)
    # Latency knobs of the fused kernel (see dequant_matmul_topk docstring).
    # Round-5 serving defaults — set by the INTERLEAVED step-level A/B
    # (scripts/ab_bench.py --level step, BASELINE round 5): fold+lse_shift
    # 801.7k tokens/s vs 750.0k base / 792.5k fold+pair / 782.0k fold
    # alone; group64 lost (694-716k); store8 remains a wash (round 4).
    # (Round 4 had rejected lse_shift WITHOUT fold — with per-chunk v-prep
    # gone, the shorter lse chain wins.)
    topk_lse_shift: bool = struct.field(pytree_node=False, default=True)
    # fold: the per-bucket offset folds into the weight tile so the
    # streamed logits tile needs only a bias add — the kernel is
    # VPU-stream-bound and this halves per-chunk v-prep.
    topk_fold: bool = struct.field(pytree_node=False, default=True)
    # pair: one survivor update per bucket (pairwise chunk max first);
    # measured within noise of fold+lse_shift but adds a same-bucket-lane
    # collision class — kept OFF as default, available for A/B.
    topk_pair: bool = struct.field(pytree_node=False, default=False)


def _fuse_cell(cell_params: dict) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """flax OptimizedLSTMCell params → ([E_in+H, 4H] matrix, [4H] bias)."""
    gates = ("i", "f", "g", "o")
    wi = jnp.concatenate([cell_params[f"i{g}"]["kernel"] for g in gates], axis=1)
    wh = jnp.concatenate([cell_params[f"h{g}"]["kernel"] for g in gates], axis=1)
    bias = jnp.concatenate([cell_params[f"h{g}"]["bias"] for g in gates])
    return jnp.concatenate([wi, wh], axis=0), bias


def pack_decoder(
    params: PyTree,
    cfg: Seq2SeqConfig,
    bits: int,
    *,
    scaling: str = "linear",
    points: Optional[jnp.ndarray] = None,
    lut_mode: str = "requant8",
    compute_dtype=jnp.bfloat16,
    use_pallas: bool = True,
    generator_group: int = 32,
    topk_slots: int = 2,
    topk_lse_shift: bool = True,
    topk_fold: bool = True,
    topk_pair: bool = False,
    generator_store_bits: Optional[int] = None,
) -> PackedDecoder:
    """Trained flax Seq2Seq params → packed inference decoder.

    ``points`` (optional, [2^bits] in the scaled domain) switches every packed
    matrix to learned-codebook dequant (differentiable-quantization deploys);
    ``lut_mode="requant8"`` (default) ships codebook values re-quantized onto
    the uniform int8 grid for uniform-kernel speed (see pack_linear).

    ``generator_group`` caps buckets/grid-step for the fused vocab kernel.
    32 measures fastest at the serving operating point at the FULL decode
    step (748.7k vs 731.4k tokens/s at 16, same-session sweep, BASELINE
    round 4; the kernel's logits tiles rotate through two fixed
    [rows, 256] scratches since round 3, so the group no longer drives
    VMEM) — size with :func:`kernels.pick_generator_group`.

    ``generator_store_bits=8`` stores the generator's quantized levels one
    per byte: identical ``bits``-level quantization and dequant values, 2x
    the generator's HBM weight bytes (8.4 MB vs 4.2 MB at the WMT shape —
    still 4x under f32), and an unpack-free kernel inner loop. The
    STANDALONE kernel probe measures it 89.3 us vs 107.5 us sub-byte with
    the fixed-shift lse, but at the FULL decode step it is a wash (721.4k
    vs 722.5k tokens/s, BASELINE round 4 — the probe chain pipelines the
    next call's weight DMA under the current call's compute, which the
    real step cannot), so the default stays sub-byte (minimal HBM).
    """
    dec = params["decoder"]
    cells = []
    for i in range(cfg.num_layers):
        w, b = _fuse_cell(dec[f"lstm_{i}"])
        cells.append(
            PackedLSTMCell(
                w=pack_linear(
                    w, bits, scaling=scaling, points=points, lut_mode=lut_mode
                ),
                bias=b,
            )
        )
    attn = dec["attn"]
    attn_in = None
    if cfg.attn_type == "general":
        attn_in = attn["linear_in"]["kernel"].astype(compute_dtype)
    attn_out = pack_linear(
        attn["linear_out"]["kernel"], bits, scaling=scaling, points=points,
        lut_mode=lut_mode,
    )
    if points is None:
        # Serving generator: pre-pad the vocab width to the grid alignment
        # with -1e9 bias on padded columns ("neg-bias masking") so the fused
        # top-k kernel can skip its per-tile padding mask, and use 16
        # buckets/grid-step (measured fastest for the wide vocab matmul —
        # see kernels.packed.bucket_group).
        from .sharded import pack_generator_sharded

        generator = pack_generator_sharded(
            params["generator"]["kernel"],
            params["generator"]["bias"],
            bits,
            mp=1,
            scaling=scaling,
            max_group=generator_group,
            store_bits=generator_store_bits,
        )
    else:
        generator = pack_linear(
            params["generator"]["kernel"],
            bits,
            scaling=scaling,
            points=points,
            bias=params["generator"]["bias"],
            lut_mode=lut_mode,
            max_group=generator_group,
        )
    return PackedDecoder(
        tgt_embed=params["tgt_embed"]["embedding"].astype(compute_dtype),
        cells=tuple(cells),
        attn_in=attn_in,
        attn_out=attn_out,
        generator=generator,
        hidden=cfg.hidden,
        compute_dtype=compute_dtype,
        use_pallas=use_pallas,
        topk_slots=topk_slots,
        topk_lse_shift=topk_lse_shift,
        topk_fold=topk_fold,
        topk_pair=topk_pair,
    )


def encode_packed(
    model, variables: PyTree, dec: PackedDecoder, src, src_len,
    *, fused: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, DecoderState]:
    """Dense-encoder pass + attention-key precompute.

    → (enc_keys [B,T,H], enc_out [B,T,H], enc_mask [B,T], init state).
    ``fused=True`` (serving default) returns the state as a
    :class:`FusedDecState` (two-buffer layout — cheap per-step beam
    reorder); ``fused=False`` returns the flax nested-tuple
    ``DecoderState`` (for driving the flax decode path side by side).
    """
    enc_out, enc_mask, state = model.apply(
        variables, src, src_len, method=model.encode
    )
    # Encoder tensors are re-read from HBM EVERY decode step (scores +
    # context) — store them in compute_dtype (bf16 in serving) so that per-
    # step traffic halves; contractions still accumulate in f32.
    enc_out = enc_out.astype(dec.compute_dtype)
    if dec.attn_in is not None:
        keys = jnp.einsum("bth,hk->btk", enc_out, dec.attn_in)
    else:
        keys = enc_out
    # Decoder state: h and input_feed are stored in compute_dtype — they
    # only ever feed compute_dtype matmuls, so storing them narrow is
    # bit-identical to the old cast-at-use (one f32->bf16 rounding either
    # way) while halving the bytes the per-step beam-reorder gather moves
    # (round-3 decomposition: the state gather was ~16us of the decode
    # step). The LSTM cell state c stays f32: it accumulates across steps.
    if fused:
        return keys, enc_out, enc_mask, fuse_dec_state(state, dec.compute_dtype)
    states, input_feed = state
    states = tuple((c, h.astype(dec.compute_dtype)) for c, h in states)
    state = (states, input_feed.astype(dec.compute_dtype))
    return keys, enc_out, enc_mask, state


def _mm(x, p: PackedLinear, dec: PackedDecoder):
    return dequant_matmul(
        x, p, compute_dtype=dec.compute_dtype, use_pallas=dec.use_pallas
    )


def _decode_body(
    dec: PackedDecoder,
    state: DecoderState,
    token: jnp.ndarray,
    enc_keys: jnp.ndarray,
    enc_out: jnp.ndarray,
    enc_mask: jnp.ndarray,
    probe: frozenset = frozenset(),
) -> Tuple[DecoderState, jnp.ndarray, jnp.ndarray]:
    """Everything up to (but excluding) the generator
    → (state, attn_h, align [rows, T_src]).

    ``state`` may be a :class:`FusedDecState` (serving layout — slice
    reads, concat rebuild; in by far the common path) or the flax
    nested-tuple ``DecoderState`` (parity/driving-the-flax-path uses);
    the output state matches the input representation.

    The encoder tensors' leading dim may be the full row count OR any
    divisor of it (sentences, with rows = sentences × beams in k-blocks):
    all beams of a sentence share its encoder outputs, so attention folds
    the beam factor into the einsum batch and the per-step HBM read of
    keys+context drops by ~the beam factor (measured ~31MB → ~6MB per step
    at the serving shape — attention was the decode step's largest HBM
    stream after the generator kernel eliminated the logits). ``align`` is
    a byproduct of that attention (free unless consumed — XLA dead-codes
    it otherwise); the coverage-penalty beam path accumulates it.
    """
    fused = isinstance(state, FusedDecState)
    hd = dec.hidden
    nl = len(dec.cells)
    if fused:
        input_feed = state.hf[:, nl * hd:]
    else:
        states, input_feed = state
    # embeddings are stored in compute_dtype; h/input_feed arrive in
    # compute_dtype (see encode_packed) so the gate-matmul input needs no
    # cast at all — gates/cell math still runs in f32
    if "noembed" in probe:  # perf probe only: elide the embedding gather
        x = jnp.broadcast_to(
            dec.tgt_embed[0][None], (token.shape[0], dec.tgt_embed.shape[1])
        ).astype(dec.compute_dtype) * (1 + token[:, None] * 0).astype(
            dec.compute_dtype
        )
    else:
        x = dec.tgt_embed[token].astype(dec.compute_dtype)
    x = jnp.concatenate([x, input_feed.astype(dec.compute_dtype)], axis=-1)
    new_states = []
    for i, cell in enumerate(dec.cells):
        if fused:
            c = state.c[:, i * hd:(i + 1) * hd]
            h = state.hf[:, i * hd:(i + 1) * hd]
        else:
            c, h = states[i]
        z = _mm(
            jnp.concatenate([x, h.astype(dec.compute_dtype)], axis=-1),
            cell.w, dec,
        ) + cell.bias
        zi, zf, zg, zo = jnp.split(z, 4, axis=-1)
        c = jax.nn.sigmoid(zf) * c + jax.nn.sigmoid(zi) * jnp.tanh(zg)
        h32 = jax.nn.sigmoid(zo) * jnp.tanh(c)
        h = h32.astype(dec.compute_dtype)
        new_states.append((c, h))
        x = h
    # Luong attention on precomputed keys, beams folded per sentence
    rows, hdim = x.shape
    nsent = enc_keys.shape[0]
    kb = rows // nsent  # beams per sentence (1 when enc is row-expanded)
    q = x.reshape(nsent, kb, hdim).astype(dec.compute_dtype)
    scores = jnp.einsum(
        "bkh,bth->bkt", q, enc_keys, preferred_element_type=jnp.float32
    )
    scores = jnp.where(enc_mask[:, None, :], scores, -1e9)
    align = jax.nn.softmax(scores, axis=-1)
    context = jnp.einsum(
        "bkt,bth->bkh",
        align.astype(dec.compute_dtype),
        enc_out,
        preferred_element_type=jnp.float32,
    ).reshape(rows, enc_out.shape[-1])
    attn_h = jnp.tanh(_mm(jnp.concatenate([context, x], axis=-1), dec.attn_out, dec))
    # stored input_feed narrows to compute_dtype (same rounding the next
    # step's gate matmul would apply anyway); the generator consumes the
    # f32 attn_h directly
    feed = attn_h.astype(dec.compute_dtype)
    if fused:
        new_state = FusedDecState(
            c=jnp.concatenate([c for c, _ in new_states], axis=-1),
            hf=jnp.concatenate(
                [h for _, h in new_states] + [feed], axis=-1
            ),
        )
    else:
        new_state = (tuple(new_states), feed)
    return new_state, attn_h, align.reshape(rows, -1)


def packed_decode_step(
    dec: PackedDecoder,
    state: DecoderState,
    token: jnp.ndarray,  # [B]
    enc_keys: jnp.ndarray,  # [B, T, H]
    enc_out: jnp.ndarray,  # [B, T, H]
    enc_mask: jnp.ndarray,  # [B, T]
    *,
    with_align: bool = False,
):
    """One serving decode step on packed weights → (state, logits [B, V])
    (+ ``align [B, T_src]`` when ``with_align`` — coverage-penalty beams)."""
    new_state, attn_h, align = _decode_body(
        dec, state, token, enc_keys, enc_out, enc_mask
    )
    # the generator is packed to grid-aligned width with -1e9 bias on the
    # padding (see pack_decoder); slice back to the true vocab
    logits = _mm(attn_h, dec.generator, dec)[:, : dec.tgt_embed.shape[0]]
    if with_align:
        return new_state, logits, align
    return new_state, logits


def packed_decode_step_topk(
    dec: PackedDecoder,
    state: DecoderState,
    token: jnp.ndarray,  # [B]
    enc_keys: jnp.ndarray,
    enc_out: jnp.ndarray,
    enc_mask: jnp.ndarray,
    k: int,
    *,
    with_align: bool = False,
    probe: frozenset = frozenset(),
):
    """Decode step returning per-row top-k candidates ``(vals, idx, lse)``
    via the fused generator kernel — the [B, V] logits never exist in HBM
    (see :mod:`..kernels.topk_fused`). Feeds :func:`.beam.step_beams_cand`;
    ``with_align`` adds the attention alignment (coverage-penalty beams).
    ``probe`` is perf-probe only (see :func:`.beam._advance`).
    """
    new_state, attn_h, align = _decode_body(
        dec, state, token, enc_keys, enc_out, enc_mask, probe=probe
    )
    cand = dequant_matmul_topk(
        attn_h,
        dec.generator,
        k,
        compute_dtype=dec.compute_dtype,
        use_pallas=dec.use_pallas,
        slots=dec.topk_slots,
        lse_shift=dec.topk_lse_shift,
        fold=dec.topk_fold,
        pair=dec.topk_pair,
    )
    if with_align:
        return new_state, cand, align
    return new_state, cand


def beam_search_packed(
    model,
    variables: PyTree,
    dec: PackedDecoder,
    src: jnp.ndarray,
    src_len: jnp.ndarray,
    cfg: BeamConfig,
    *,
    fused_topk: Optional[bool] = None,
    return_attention: bool = False,
    probe: frozenset = frozenset(),
    fused_state: bool = True,
    combine: str = "auto",
) -> Tuple[jnp.ndarray, ...]:
    """Beam search driven by the packed decode step (serving entry point).

    ``fused_topk`` selects the candidate-based beam core fed by the fused
    dequant+matmul+top-k generator kernel; default: on whenever the beam
    fits the kernel (beam_size <= 8 — it always does for reference-parity
    beams; onmt used beam 5). ``return_attention`` appends per-hypothesis
    attention (reference Translator attn output) — see
    :func:`.beam.beam_decode`.
    """
    b, k = src.shape[0], cfg.beam_size
    if fused_topk is None:
        fused_topk = k <= KMAX
    # fused_state=False keeps the nested-tuple DecoderState (slow per-step
    # reorder) — A/B hook only; the FusedDecState layout is the default
    keys, enc_out, enc_mask, state = encode_packed(
        model, variables, dec, src, src_len, fused=fused_state
    )
    # encoder tensors stay per-SENTENCE (not beam-expanded): _decode_body
    # folds the beam factor into the attention batch, cutting its per-step
    # HBM read by ~k
    state_b = expand_to_beams(state, k)
    with_align = cfg.coverage_penalty != 0.0 or return_attention
    cov_len = enc_out.shape[1]

    if fused_topk:

        def decode_cand(s, tokens):
            return packed_decode_step_topk(
                dec, s, tokens, keys, enc_out, enc_mask, k,
                with_align=with_align, probe=probe,
            )

        # combine="auto": the fused pallas beam-combine when the decoder
        # runs pallas kernels (interleaved step A/B: 857.8k vs 831.1k
        # tokens/s, −4.8us/step — BASELINE round 5), else the identical
        # lax.top_k fallback
        if combine == "auto":
            combine = "pallas" if dec.use_pallas else "xla"
        elif combine == "pallas" and not dec.use_pallas:
            combine = "xla"  # no TPU below us — the fallback is identical
        return beam_decode(
            decode_cand, state_b, b, cfg, candidates=True,
            coverage_len=cov_len, return_attention=return_attention,
            probe=probe, combine=combine,
        )

    def decode_step(s, tokens):
        return packed_decode_step(
            dec, s, tokens, keys, enc_out, enc_mask, with_align=with_align
        )

    return beam_decode(
        decode_step, state_b, b, cfg, coverage_len=cov_len,
        return_attention=return_attention,
    )
