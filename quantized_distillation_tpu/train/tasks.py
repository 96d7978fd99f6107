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
    thread_carry: bool = False,
) -> Task:
    """Word-level LM training with per-time-step distillation (models/lm.py).

    ``thread_carry=False``: windows are independent inside the jitted step
    (carry reset per window). ``thread_carry=True`` is the standard PTB
    recipe: the LSTM carry (student's AND teacher's) continues across the
    contiguous-BPTT windows of ``data/lm.py`` with a stop-gradient at window
    boundaries. It rides the trainer's carry channel — seed
    ``TrainState.carry`` with :func:`lm_initial_carry`, and pass
    ``initial_carry=`` to :func:`.loops.evaluate` for threaded eval (see
    ``examples/ptb_lm_distill.py``).
    """

    if teacher_model is not None and teacher_variables is None:
        raise ValueError("teacher_model requires teacher_variables")

    def loss_and_metrics(logits, teacher_logits, batch, distill):
        if thread_carry:
            # stateful variant bundles (student, teacher) logits opaquely
            logits, teacher_logits = logits
        mask = jnp.ones(batch["target"].shape, jnp.float32)
        loss = distillation_loss(
            logits, teacher_logits, batch["target"], distill, mask
        )
        nll_sum, n_tok = perplexity_terms(logits, batch["target"], mask)
        return loss, {"nll_sum": nll_sum, "n_tokens": n_tok}

    if thread_carry:
        # Stateful variant: the teacher must run inside student_forward so
        # its carry can be threaded too (teacher_forward's contract has no
        # state channel). Both logits travel opaquely through the Task's
        # ``logits`` slot; the new carries go out via updates["carry"].
        def student_forward(variables, batch, train, rngs):
            carry = batch.get("carry")
            logits, new_s = student_model.apply(
                variables,
                batch["input"],
                None if carry is None else carry["student"],
                train=train,
                rngs=rngs if train else {},
            )
            # eval: teacher unused — pass its carry through unchanged so the
            # carry treedef stays stable across train/eval batches
            t_logits = None
            new_t = None if carry is None else carry["teacher"]
            if teacher_model is not None and train:
                t_logits, new_t = teacher_model.apply(
                    teacher_variables,
                    batch["input"],
                    None if carry is None else carry["teacher"],
                    train=False,
                )
                t_logits = jax.lax.stop_gradient(t_logits)
                new_t = jax.lax.stop_gradient(new_t)
            return (logits, t_logits), {
                "carry": {"student": new_s, "teacher": new_t}
            }

        return Task(student_forward, loss_and_metrics, None)

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

        def teacher_forward(batch):
            logits, _ = teacher_model.apply(
                teacher_variables, batch["input"], train=False
            )
            return logits

    return Task(student_forward, loss_and_metrics, teacher_forward)


def lm_initial_carry(
    student_model, batch_size: int, teacher_model=None
) -> PyTree:
    """Zero carry pytree for a ``thread_carry`` LM task (train or eval)."""
    return {
        "student": student_model.initial_carry(batch_size),
        "teacher": (
            teacher_model.initial_carry(batch_size) if teacher_model else None
        ),
    }
