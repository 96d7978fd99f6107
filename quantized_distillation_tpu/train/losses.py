"""Classification and knowledge-distillation losses.

Re-designs the reference's loss helpers (``cnn_models/help_fun.py`` for the
CNN path; ``translation_models/help_fun.py`` + ``onmt/Loss.py`` for NMT):

  loss = (1 - w) * CE(student, labels)
       + w * T^2 * KL( softmax_T(teacher) || softmax_T(student) )

with temperature ``T`` and mixing weight ``w`` (Hinton-style KD, the paper's
distillation loss). The NMT variant applies the same per time step with a
padding mask (word-level distillation).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import DistillSpec


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over the batch; ``labels`` are int class ids, logits [..., V]."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def masked_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Token-mean CE over unmasked positions (NLL with padding mask,
    reference: onmt/Loss.py)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(nll * mask) / denom


def kd_kl(
    student_logits: jnp.ndarray,
    teacher_logits: jnp.ndarray,
    temperature: float,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """T^2-scaled KL(softmax_T(teacher) || softmax_T(student)).

    The T^2 factor keeps gradient magnitudes comparable across temperatures
    (Hinton et al. 2015), as in the reference's distillation-loss helper.
    """
    t = temperature
    p_teacher = jax.nn.softmax(teacher_logits / t, axis=-1)
    logp_teacher = jax.nn.log_softmax(teacher_logits / t, axis=-1)
    logp_student = jax.nn.log_softmax(student_logits / t, axis=-1)
    kl = jnp.sum(p_teacher * (logp_teacher - logp_student), axis=-1)
    if mask is not None:
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        return (t * t) * jnp.sum(kl * mask) / denom
    return (t * t) * jnp.mean(kl)


def distillation_loss(
    student_logits: jnp.ndarray,
    teacher_logits: Optional[jnp.ndarray],
    labels: jnp.ndarray,
    spec: Optional[DistillSpec],
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Combined KD loss; plain CE when distillation is off (spec/teacher None)."""
    ce = (
        masked_cross_entropy(student_logits, labels, mask)
        if mask is not None
        else cross_entropy(student_logits, labels)
    )
    if spec is None or teacher_logits is None:
        return ce
    teacher_logits = jax.lax.stop_gradient(teacher_logits)
    kl = kd_kl(student_logits, teacher_logits, spec.temperature, mask)
    return (1.0 - spec.weight) * ce + spec.weight * kl


def accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))


def perplexity_terms(
    logits: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(sum NLL, token count) — aggregate across batches, then exp(nll/count)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask), jnp.sum(mask)
