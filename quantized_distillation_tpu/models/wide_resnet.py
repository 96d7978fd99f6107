"""WideResNet for CIFAR-100 (teacher) and narrower students.

Re-designs the reference's ``cnn_models/wide_resnet.py``: the standard
WRN-depth-k of Zagoruyko & Komodakis — pre-activation BasicBlocks in three
groups of widths ``16k/32k/64k``, stride 2 between groups, global average pool
and a linear classifier. ``WideResNet(depth=28, widen=10)`` is the CIFAR-100
teacher scale; students use smaller depth/widen (e.g. 16-2).

TPU notes: NHWC, 3x3 convs without bias (BN provides the shift), widths are
multiples of 16 for k>=1 so the conv matmuls tile cleanly onto the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class BasicBlock(nn.Module):
    """Pre-activation residual block: BN-ReLU-Conv3x3 twice + shortcut."""

    filters: int
    stride: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        h = nn.BatchNorm(use_running_average=not train)(x)
        h = nn.relu(h)
        # Pre-activation shortcut: projection reads the activated input when
        # shape changes (stride or width), identity otherwise.
        if x.shape[-1] != self.filters or self.stride != 1:
            shortcut = nn.Conv(
                self.filters, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="shortcut",
            )(h)
        else:
            shortcut = x
        h = nn.Conv(
            self.filters, (3, 3), strides=(self.stride, self.stride),
            padding="SAME", use_bias=False,
        )(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(self.filters, (3, 3), padding="SAME", use_bias=False)(h)
        return h + shortcut


class WideResNet(nn.Module):
    """WRN-depth-widen; depth = 6n + 4."""

    depth: int = 16
    widen: int = 2
    num_classes: int = 100
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        if (self.depth - 4) % 6 != 0:
            raise ValueError(f"WRN depth must be 6n+4, got {self.depth}")
        n = (self.depth - 4) // 6
        widths = [16 * self.widen, 32 * self.widen, 64 * self.widen]
        x = nn.Conv(16, (3, 3), padding="SAME", use_bias=False, name="conv_init")(x)
        for group, width in enumerate(widths):
            for i in range(n):
                stride = 2 if (group > 0 and i == 0) else 1
                x = BasicBlock(width, stride=stride, dropout=self.dropout)(
                    x, train=train
                )
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes)(x)


WRN_PRESETS = {
    "teacher": dict(depth=28, widen=10),
    "student_large": dict(depth=22, widen=4),
    "student_medium": dict(depth=16, widen=4),
    "student_small": dict(depth=16, widen=2),
}


def make_wrn(preset: str = "student_small", num_classes: int = 100) -> WideResNet:
    return WideResNet(num_classes=num_classes, **WRN_PRESETS[preset])
