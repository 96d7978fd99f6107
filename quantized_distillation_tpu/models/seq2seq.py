"""OpenNMT-style LSTM seq2seq with Luong global attention + input feeding.

Re-designs the reference's vendored 2017 OpenNMT-py model stack
(``onmt/Models.py``: ``Encoder``/``Decoder``/``NMTModel``,
``onmt/modules/GlobalAttention.py``): an LSTM encoder (optionally
bidirectional), a stacked-LSTM decoder with Luong attention ("dot" or
"general" score) and input feeding, and a linear generator over the target
vocabulary.

TPU-first design, instead of the reference's per-time-step Python loop:

- The teacher-forced decode is a single ``nn.scan`` (→ ``lax.scan``) over
  time, compiled once; no Python stepping.
- The serving decode step reuses the *same* scanned module with a length-1
  token slice, so training and serving share parameters and code exactly
  (reference splits these across ``Models.py`` and ``Translator.py``).
- The decoder carry ``DecoderState`` (per-layer (c, h) + input-feed vector)
  is an explicit pytree — this is the "KV-cache" analog that the serving
  engine keeps resident and the mesh shards over the model axis.
- Static shapes everywhere: padded batches + masks, masked attention softmax.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import flax.core
import flax.linen as nn
import jax
import jax.numpy as jnp

# Decoder carry: (((c, h) per layer, ...), input_feed [B, H])
DecoderState = Tuple[Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...], jnp.ndarray]


@dataclass(frozen=True)
class Seq2SeqConfig:
    src_vocab: int
    tgt_vocab: int
    embed_dim: int = 500
    hidden: int = 500
    num_layers: int = 2
    bidirectional: bool = False
    attn_type: str = "general"  # 'general' (h W h_s) or 'dot' (h . h_s)
    dropout: float = 0.3
    pad_id: int = 0
    bos_id: int = 1
    eos_id: int = 2


# Teacher/student scales for the WMT13 de→en experiments. The reference uses
# 2017 onmt defaults (2x500 LSTM); students shrink width as in the paper.
SEQ2SEQ_PRESETS = {
    "teacher": dict(embed_dim=500, hidden=500, num_layers=2),
    "student_medium": dict(embed_dim=256, hidden=256, num_layers=2),
    "student_small": dict(embed_dim=128, hidden=128, num_layers=1),
}


def make_seq2seq(
    preset: str, src_vocab: int, tgt_vocab: int, **overrides
) -> "Seq2Seq":
    kw = dict(SEQ2SEQ_PRESETS[preset])
    kw.update(overrides)
    return Seq2Seq(Seq2SeqConfig(src_vocab=src_vocab, tgt_vocab=tgt_vocab, **kw))


class Encoder(nn.Module):
    """Embedding + stacked (optionally bidirectional) LSTM over the source."""

    cfg: Seq2SeqConfig

    @nn.compact
    def __call__(
        self, src: jnp.ndarray, src_len: jnp.ndarray, *, train: bool = False
    ) -> Tuple[jnp.ndarray, Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]]:
        cfg = self.cfg
        x = nn.Embed(cfg.src_vocab, cfg.embed_dim, name="embed")(src)
        finals = []
        for layer in range(cfg.num_layers):
            if cfg.bidirectional:
                if cfg.hidden % 2:
                    raise ValueError("bidirectional needs even hidden size")
                half = cfg.hidden // 2
                fw_carry, fw = nn.RNN(
                    nn.OptimizedLSTMCell(half), return_carry=True,
                    name=f"lstm_fw_{layer}",
                )(x, seq_lengths=src_len)
                bw_carry, bw = nn.RNN(
                    nn.OptimizedLSTMCell(half), return_carry=True, reverse=True,
                    keep_order=True, name=f"lstm_bw_{layer}",
                )(x, seq_lengths=src_len)
                x = jnp.concatenate([fw, bw], axis=-1)
                c = jnp.concatenate([fw_carry[0], bw_carry[0]], axis=-1)
                h = jnp.concatenate([fw_carry[1], bw_carry[1]], axis=-1)
            else:
                carry, x = nn.RNN(
                    nn.OptimizedLSTMCell(cfg.hidden), return_carry=True,
                    name=f"lstm_{layer}",
                )(x, seq_lengths=src_len)
                c, h = carry
            finals.append((c, h))
            if layer + 1 < cfg.num_layers and cfg.dropout > 0:
                x = nn.Dropout(cfg.dropout, deterministic=not train)(x)
        return x, tuple(finals)


class LuongAttention(nn.Module):
    """Global attention (Luong et al. 2015), as in onmt GlobalAttention.

    score 'dot': h_t · h_s ; 'general': h_t · (W_a h_s).
    Output: attn_h = tanh(W_c [context; h_t]) and the alignment weights.
    """

    cfg: Seq2SeqConfig

    @nn.compact
    def __call__(
        self, h_t: jnp.ndarray, enc_out: jnp.ndarray, enc_mask: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        keys = enc_out
        if cfg.attn_type == "general":
            keys = nn.Dense(cfg.hidden, use_bias=False, name="linear_in")(enc_out)
        elif cfg.attn_type != "dot":
            raise ValueError(f"unknown attn_type {cfg.attn_type!r}")
        # scores [B, T_src] — one query per call (stepwise decoding)
        scores = jnp.einsum("bh,bth->bt", h_t, keys)
        scores = jnp.where(enc_mask, scores, -1e9)
        align = jax.nn.softmax(scores, axis=-1)
        context = jnp.einsum("bt,bth->bh", align, enc_out)
        attn_h = nn.tanh(
            nn.Dense(cfg.hidden, use_bias=False, name="linear_out")(
                jnp.concatenate([context, h_t], axis=-1)
            )
        )
        return attn_h, align


class DecoderStep(nn.Module):
    """One decoder time step: stacked LSTM + attention + input feed.

    Carry: ``DecoderState``. Scanned over time by :class:`Seq2Seq` for
    teacher forcing; applied to length-1 slices for serving.
    """

    cfg: Seq2SeqConfig

    @nn.compact
    def __call__(
        self,
        carry: DecoderState,
        y_emb: jnp.ndarray,  # [B, E]
        enc_out: jnp.ndarray,  # [B, T_src, H]
        enc_mask: jnp.ndarray,  # [B, T_src] bool
        train: bool = False,
    ) -> Tuple[DecoderState, Tuple[jnp.ndarray, jnp.ndarray]]:
        cfg = self.cfg
        states, input_feed = carry
        x = jnp.concatenate([y_emb, input_feed], axis=-1)
        new_states = []
        for i in range(cfg.num_layers):
            new_s, x = nn.OptimizedLSTMCell(cfg.hidden, name=f"lstm_{i}")(
                states[i], x
            )
            new_states.append(new_s)
            if cfg.dropout > 0:
                x = nn.Dropout(
                    cfg.dropout, deterministic=not train, name=f"drop_{i}"
                )(x)
        attn_h, align = LuongAttention(cfg, name="attn")(x, enc_out, enc_mask)
        if cfg.dropout > 0:
            attn_h = nn.Dropout(cfg.dropout, deterministic=not train, name="drop_out")(
                attn_h
            )
        return (tuple(new_states), attn_h), (attn_h, align)


class Seq2Seq(nn.Module):
    """NMTModel analog: encode, init decoder state, scan decode, generate."""

    cfg: Seq2SeqConfig

    def setup(self):
        cfg = self.cfg
        self.encoder = Encoder(cfg, name="encoder")
        self.tgt_embed = nn.Embed(cfg.tgt_vocab, cfg.embed_dim, name="tgt_embed")
        # nn.scan turns DecoderStep into a time-axis loop with shared params;
        # the serving path reuses the same module (same param tree) with T=1.
        self.decoder = nn.scan(
            DecoderStep,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=(1, flax.core.broadcast, flax.core.broadcast, flax.core.broadcast),
            out_axes=1,
        )(cfg, name="decoder")
        self.generator = nn.Dense(cfg.tgt_vocab, name="generator")

    def encode(self, src, src_len, *, train: bool = False):
        """→ (enc_out [B,T,H], enc_mask [B,T], initial DecoderState)."""
        enc_out, finals = self.encoder(src, src_len, train=train)
        t = jnp.arange(src.shape[1])[None, :]
        enc_mask = t < src_len[:, None]
        input_feed = jnp.zeros(
            (src.shape[0], self.cfg.hidden), dtype=enc_out.dtype
        )
        return enc_out, enc_mask, (finals, input_feed)

    def decode(
        self,
        state: DecoderState,
        tgt_in: jnp.ndarray,  # [B, T_tgt] teacher-forcing inputs (BOS-shifted)
        enc_out: jnp.ndarray,
        enc_mask: jnp.ndarray,
        *,
        train: bool = False,
    ) -> Tuple[DecoderState, jnp.ndarray]:
        """Teacher-forced decode → (final state, logits [B, T_tgt, V])."""
        y_emb = self.tgt_embed(tgt_in)  # [B, T, E]
        state, (attn_h, _) = self.decoder(state, y_emb, enc_out, enc_mask, train)
        logits = self.generator(attn_h)
        return state, logits

    def decode_step(
        self,
        state: DecoderState,
        token: jnp.ndarray,  # [B] int32
        enc_out: jnp.ndarray,
        enc_mask: jnp.ndarray,
    ) -> Tuple[DecoderState, jnp.ndarray]:
        """One greedy/beam serving step → (state, logits [B, V])."""
        y_emb = self.tgt_embed(token[:, None])  # [B, 1, E]
        state, (attn_h, _) = self.decoder(state, y_emb, enc_out, enc_mask, False)
        return state, self.generator(attn_h[:, 0])

    def decode_step_attn(
        self,
        state: DecoderState,
        token: jnp.ndarray,  # [B] int32
        enc_out: jnp.ndarray,
        enc_mask: jnp.ndarray,
    ) -> Tuple[DecoderState, jnp.ndarray, jnp.ndarray]:
        """:meth:`decode_step` that also exposes the attention alignment
        ``align [B, T_src]`` — the coverage-penalty beam path accumulates it
        (reference ``onmt/Beam.py`` GlobalScorer coverage)."""
        y_emb = self.tgt_embed(token[:, None])  # [B, 1, E]
        state, (attn_h, align) = self.decoder(
            state, y_emb, enc_out, enc_mask, False
        )
        return state, self.generator(attn_h[:, 0]), align[:, 0]

    def __call__(
        self,
        src: jnp.ndarray,
        src_len: jnp.ndarray,
        tgt_in: jnp.ndarray,
        *,
        train: bool = False,
    ) -> jnp.ndarray:
        """Full forward (training/eval): logits [B, T_tgt, V]."""
        enc_out, enc_mask, state = self.encode(src, src_len, train=train)
        _, logits = self.decode(
            state, tgt_in, enc_out, enc_mask, train=train
        )
        return logits
