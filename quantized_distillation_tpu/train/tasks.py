"""Task bindings: vision classification and NMT sequence training.

These adapt the model zoo to the generic trainer, mirroring the split in the
reference between ``cnn_models/help_fun.py`` (CNN train/eval + KD) and
``translation_models/help_fun.py`` (NMT train/eval + word-level KD).

Batch formats:
  vision: {"image": [B,H,W,C] float, "label": [B] int}
  nmt:    {"src": [B,Ts] int, "src_len": [B] int,
           "tgt_in": [B,Tt] int (BOS-shifted), "tgt_out": [B,Tt] int,
           "tgt_mask": [B,Tt] float}
  lm:     {"input": [B,T] int, "target": [B,T] int}  (data/lm.py windows)
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from .losses import accuracy, distillation_loss, perplexity_terms
from .trainer import Task

PyTree = Any


def vision_task(
    student_model,
    teacher_model=None,
    teacher_variables: Optional[PyTree] = None,
) -> Task:
    """CNN / WideResNet classification with optional KD teacher."""

    def student_forward(variables, batch, train, rngs):
        if train:
            logits, updates = student_model.apply(
                variables,
                batch["image"],
                train=True,
                rngs=rngs,
                mutable=["batch_stats"],
            )
            return logits, updates
        return student_model.apply(variables, batch["image"], train=False), {}

    teacher_forward = None
    if teacher_model is not None:
        if teacher_variables is None:
            raise ValueError("teacher_model requires teacher_variables")

        def teacher_forward(batch):
            return teacher_model.apply(teacher_variables, batch["image"], train=False)

    def loss_and_metrics(logits, teacher_logits, batch, distill):
        loss = distillation_loss(logits, teacher_logits, batch["label"], distill)
        return loss, {"accuracy": accuracy(logits, batch["label"])}

    return Task(student_forward, loss_and_metrics, teacher_forward)


def nmt_task(
    student_model,
    teacher_model=None,
    teacher_variables: Optional[PyTree] = None,
) -> Task:
    """Seq2seq training with word-level (per-time-step) distillation.

    The teacher runs on the same teacher-forced batch; KD is the per-step KL
    between teacher and student next-token distributions, masked by target
    padding (reference: ``translation_models/help_fun.py``).
    """

    def student_forward(variables, batch, train, rngs):
        logits = student_model.apply(
            variables,
            batch["src"],
            batch["src_len"],
            batch["tgt_in"],
            train=train,
            rngs=rngs if train else {},
        )
        return logits, {}

    teacher_forward = None
    if teacher_model is not None:
        if teacher_variables is None:
            raise ValueError("teacher_model requires teacher_variables")

        def teacher_forward(batch):
            return teacher_model.apply(
                teacher_variables,
                batch["src"],
                batch["src_len"],
                batch["tgt_in"],
                train=False,
            )

    def loss_and_metrics(logits, teacher_logits, batch, distill):
        mask = batch["tgt_mask"]
        loss = distillation_loss(
            logits, teacher_logits, batch["tgt_out"], distill, mask
        )
        nll_sum, n_tok = perplexity_terms(logits, batch["tgt_out"], mask)
        return loss, {"nll_sum": nll_sum, "n_tokens": n_tok}

    return Task(student_forward, loss_and_metrics, teacher_forward)


def lm_task(
    student_model,
    teacher_model=None,
    teacher_variables: Optional[PyTree] = None,
) -> Task:
    """Word-level LM training with per-time-step distillation (models/lm.py).

    Windows are treated independently inside the jitted step (carry reset per
    window — the model's explicit-carry API supports threading state across
    windows in a custom loop; see ``examples/ptb_lm_distill.py``).
    """

    def student_forward(variables, batch, train, rngs):
        logits, _ = student_model.apply(
            variables,
            batch["input"],
            train=train,
            rngs=rngs if train else {},
        )
        return logits, {}

    teacher_forward = None
    if teacher_model is not None:
        if teacher_variables is None:
            raise ValueError("teacher_model requires teacher_variables")

        def teacher_forward(batch):
            logits, _ = teacher_model.apply(
                teacher_variables, batch["input"], train=False
            )
            return logits

    def loss_and_metrics(logits, teacher_logits, batch, distill):
        mask = jnp.ones(batch["target"].shape, jnp.float32)
        loss = distillation_loss(
            logits, teacher_logits, batch["target"], distill, mask
        )
        nll_sum, n_tok = perplexity_terms(logits, batch["target"], mask)
        return loss, {"nll_sum": nll_sum, "n_tokens": n_tok}

    return Task(student_forward, loss_and_metrics, teacher_forward)
