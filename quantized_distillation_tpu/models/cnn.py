"""Small CIFAR-10 CNN teacher/student family.

Re-designs the reference's ``cnn_models/conv_forward_model.py``
(``ConvolForwardNet``-style conv/BN/ReLU/MaxPool stacks + FC head + dropout):
a configurable plain CNN with named presets for the teacher (~5M params) and
the smaller distillation students. Exact reference layer widths could not be
re-verified (reference mount empty — SURVEY.md §0), so presets follow the
paper's description (arXiv:1802.05668 CIFAR-10 experiments): a deep-ish conv
stack teacher and progressively narrower/shallower students.

TPU notes: NHWC layout (XLA's native conv layout on TPU), channel counts kept
at multiples of 8 where possible so conv im2col matmuls tile onto the MXU.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


@dataclass(frozen=True)
class CNNSpec:
    """(filters, use_pool) per conv layer + FC widths."""

    conv: Tuple[Tuple[int, bool], ...]
    fc: Tuple[int, ...]
    num_classes: int = 10
    dropout: float = 0.3


# Teacher ≈ 5M params; students shrink width/depth like the paper's
# "smaller/narrower" CIFAR-10 students.
PRESETS = {
    "teacher": CNNSpec(
        conv=((96, False), (96, True), (192, False), (192, True), (256, True)),
        fc=(1024, 512),
    ),
    "student_large": CNNSpec(
        conv=((64, False), (64, True), (128, True), (128, True)),
        fc=(512,),
    ),
    "student_medium": CNNSpec(
        conv=((32, True), (64, True), (96, True)),
        fc=(256,),
    ),
    "student_small": CNNSpec(
        conv=((16, True), (32, True), (48, True)),
        fc=(128,),
    ),
}


class ConvForwardNet(nn.Module):
    """Conv/BN/ReLU(/MaxPool) stack + dropout + FC head."""

    spec: CNNSpec

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        for filters, pool in self.spec.conv:
            x = nn.Conv(filters, (3, 3), padding="SAME", use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.relu(x)
            if pool:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)
        for width in self.spec.fc:
            x = nn.Dense(width)(x)
            x = nn.relu(x)
            x = nn.Dropout(self.spec.dropout, deterministic=not train)(x)
        return nn.Dense(self.spec.num_classes)(x)


def make_cnn(preset: str = "teacher", num_classes: int = 10) -> ConvForwardNet:
    spec = PRESETS[preset]
    if num_classes != spec.num_classes:
        spec = CNNSpec(
            conv=spec.conv, fc=spec.fc, num_classes=num_classes, dropout=spec.dropout
        )
    return ConvForwardNet(spec)
