"""ImageNet-family ResNets (teacher/student pairs for quantized distillation).

The paper (arXiv:1802.05668) also reports ImageNet experiments distilling
into quantized ResNet students; the reference code drives stock torchvision
ResNets through the same ``cnn_models/help_fun.py`` train loop (SURVEY.md §0
workloads, ImageNet tagged [L]). Here the family is first-class: standard
post-activation ResNet-v1 (He et al.) with BasicBlock (18/34) and Bottleneck
(50) variants, NHWC for TPU convolutions, widths in multiples of 64 so every
conv lowers to well-tiled MXU matmuls.

Students shrink by a width multiplier (the paper's approach of narrower
students) rather than bespoke architectures, so teacher/student share code.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class ResNetBlock(nn.Module):
    """Post-activation basic block: Conv-BN-ReLU-Conv-BN + shortcut, ReLU."""

    filters: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        shortcut = x
        h = nn.Conv(
            self.filters, (3, 3), strides=(self.stride, self.stride),
            padding="SAME", use_bias=False,
        )(x)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = nn.Conv(self.filters, (3, 3), padding="SAME", use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train, scale_init=nn.initializers.zeros)(h)
        if shortcut.shape[-1] != self.filters or self.stride != 1:
            shortcut = nn.Conv(
                self.filters, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="shortcut",
            )(x)
            shortcut = nn.BatchNorm(
                use_running_average=not train, name="shortcut_bn"
            )(shortcut)
        return nn.relu(h + shortcut)


class BottleneckBlock(nn.Module):
    """1x1 → 3x3 → 1x1 bottleneck with 4x expansion."""

    filters: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        out_ch = 4 * self.filters
        shortcut = x
        h = nn.Conv(self.filters, (1, 1), use_bias=False)(x)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = nn.Conv(
            self.filters, (3, 3), strides=(self.stride, self.stride),
            padding="SAME", use_bias=False,
        )(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = nn.Conv(out_ch, (1, 1), use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train, scale_init=nn.initializers.zeros)(h)
        if shortcut.shape[-1] != out_ch or self.stride != 1:
            shortcut = nn.Conv(
                out_ch, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="shortcut",
            )(x)
            shortcut = nn.BatchNorm(
                use_running_average=not train, name="shortcut_bn"
            )(shortcut)
        return nn.relu(h + shortcut)


class ResNet(nn.Module):
    """ResNet-v1. ``stage_sizes`` blocks per stage at widths 64w/128w/256w/512w.

    ``small_inputs`` swaps the ImageNet 7x7/s2 stem + maxpool for a 3x3 stem
    (CIFAR-style inputs), so the same family serves both resolutions.
    """

    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    bottleneck: bool = False
    num_classes: int = 1000
    width_mult: float = 1.0
    small_inputs: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        w0 = max(int(64 * self.width_mult), 16)
        if self.small_inputs:
            x = nn.Conv(w0, (3, 3), padding="SAME", use_bias=False, name="stem")(x)
        else:
            x = nn.Conv(
                w0, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                use_bias=False, name="stem",
            )(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        if not self.small_inputs:
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        block = BottleneckBlock if self.bottleneck else ResNetBlock
        for stage, n_blocks in enumerate(self.stage_sizes):
            filters = max(int(64 * (2 ** stage) * self.width_mult), 16)
            for i in range(n_blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                x = block(filters, stride=stride)(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes)(x)


RESNET_PRESETS = {
    # teacher scales
    "resnet18": dict(stage_sizes=(2, 2, 2, 2), bottleneck=False),
    "resnet34": dict(stage_sizes=(3, 4, 6, 3), bottleneck=False),
    "resnet50": dict(stage_sizes=(3, 4, 6, 3), bottleneck=True),
    # narrower students (paper: same depth, smaller width)
    "resnet18_half": dict(stage_sizes=(2, 2, 2, 2), bottleneck=False, width_mult=0.5),
    "resnet18_quarter": dict(stage_sizes=(2, 2, 2, 2), bottleneck=False, width_mult=0.25),
}


def make_resnet(
    preset: str = "resnet18",
    num_classes: int = 1000,
    *,
    small_inputs: bool = False,
) -> ResNet:
    return ResNet(
        num_classes=num_classes, small_inputs=small_inputs, **RESNET_PRESETS[preset]
    )
