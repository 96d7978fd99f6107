"""Word-level LSTM language model (Penn-Treebank-style experiments).

SURVEY §1 tags a PennTreeBank experiment in the reference as [L] (possibly
present — ``datasets/PennTreeBank``); the paper's method applies to word-level
LM compression either way, so this family closes that gap: a Zaremba-style
stacked-LSTM LM (embed → stacked LSTM → vocab generator, optionally with
tied input/output embeddings) usable as teacher or student under the same
quantized-distillation / differentiable-quantization trainers as the other
model families.

TPU-first design notes:

- The whole window is one ``nn.RNN`` (→ ``lax.scan``) per layer — no Python
  time stepping; static ``[B, T]`` shapes from the contiguous-BPTT batcher
  (``data/lm.py``).
- Truncated-BPTT state carrying is explicit: ``__call__`` takes and returns
  the per-layer ``(c, h)`` carry as a pytree, so the train loop can thread it
  across windows with ``jax.lax.stop_gradient`` (standard PTB recipe) while
  the step stays a single jit.
- Tied embeddings (``tie_embeddings=True``) reuse the embed matrix as the
  generator — halves the dominant parameter block before quantization even
  starts, and keeps the big matmul MXU-shaped.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

# Per-layer LSTM carry: ((c, h), ...) — same convention as models/seq2seq.py.
LMCarry = Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]


@dataclass(frozen=True)
class LMConfig:
    vocab: int
    embed_dim: int = 650
    hidden: int = 650
    num_layers: int = 2
    dropout: float = 0.5
    tie_embeddings: bool = False


# Teacher = Zaremba et al. "medium" PTB LSTM (2x650, dropout 0.5); students
# shrink width/depth the way the paper's CNN/NMT students do.
LM_PRESETS = {
    "teacher": dict(embed_dim=650, hidden=650, num_layers=2, dropout=0.5),
    "student_medium": dict(embed_dim=256, hidden=256, num_layers=2, dropout=0.3),
    "student_small": dict(embed_dim=128, hidden=128, num_layers=1, dropout=0.2),
}


def make_lm(preset: str, vocab: int, **overrides) -> "LSTMLanguageModel":
    kw = dict(LM_PRESETS[preset])
    kw.update(overrides)
    return LSTMLanguageModel(LMConfig(vocab=vocab, **kw))


class LSTMLanguageModel(nn.Module):
    """Embed → stacked LSTM (scanned) → logits over the vocabulary."""

    cfg: LMConfig

    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,  # [B, T] int32
        carry: Optional[LMCarry] = None,
        *,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, LMCarry]:
        """→ (logits [B, T, V], final carry). ``carry=None`` starts from zeros."""
        cfg = self.cfg
        if cfg.tie_embeddings and cfg.embed_dim != cfg.hidden:
            raise ValueError("tie_embeddings requires embed_dim == hidden")
        embed = nn.Embed(cfg.vocab, cfg.embed_dim, name="embed")
        x = embed(tokens)
        if cfg.dropout > 0:
            x = nn.Dropout(cfg.dropout, deterministic=not train)(x)
        finals = []
        for layer in range(cfg.num_layers):
            init = carry[layer] if carry is not None else None
            final, x = nn.RNN(
                nn.OptimizedLSTMCell(cfg.hidden),
                return_carry=True,
                name=f"lstm_{layer}",
            )(x, initial_carry=init)
            finals.append(final)
            if cfg.dropout > 0:
                x = nn.Dropout(cfg.dropout, deterministic=not train)(x)
        if cfg.tie_embeddings:
            logits = embed.attend(x)
        else:
            logits = nn.Dense(cfg.vocab, name="generator")(x)
        return logits, tuple(finals)

    def initial_carry(self, batch_size: int) -> LMCarry:
        cfg = self.cfg

        # distinct buffers per slot: a shared zeros array would alias inside
        # TrainState.carry and break the train step's buffer donation
        def z():
            return jnp.zeros((batch_size, cfg.hidden), jnp.float32)

        return tuple((z(), z()) for _ in range(cfg.num_layers))
