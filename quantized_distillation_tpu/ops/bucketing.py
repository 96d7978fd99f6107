"""Bucketed per-group scaling for weight quantization.

The reference (``quantization/__init__.py``, bucketed scaling inside
``uniformQuantization``/``nonUniformQuantization``) flattens a tensor, chops it
into buckets of ``bucket_size`` (256 in all paper experiments) and scales each
bucket independently before quantizing, so the per-weight overhead of the
scaling constants is 2 floats / 256 weights (linear) or 1 float / 256 weights
(abs-max).

TPU-first design notes:

- All functions are pure ``jnp`` and shape-static, so they fuse inside a jitted
  train step (reshape + per-row min/max reductions lower to VPU code).
- The flat tail is padded with the edge value so the padded elements never
  change a bucket's min/max/abs-max statistics, then stripped again on the way
  out. 256 = 2 * 128 lanes, so buckets align exactly with TPU lane tiling.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

DEFAULT_BUCKET_SIZE = 256

LINEAR = "linear"
ABSMAX = "absmax"
_SCALINGS = (LINEAR, ABSMAX)


class ScaleParams(NamedTuple):
    """Per-bucket affine scaling ``scaled = (x - offset) / scale``.

    For ``linear`` scaling: ``offset = min``, ``scale = max - min`` → [0, 1].
    For ``absmax`` scaling: ``offset = -absmax``, ``scale = 2 * absmax``, which
    maps [-absmax, absmax] → [0, 1] (one uniform [0,1] code path for both).
    ``kind`` records which one produced the params (needed for size
    accounting: linear stores 2 floats/bucket, absmax only 1).
    """

    offset: jnp.ndarray  # [n_buckets, 1]
    scale: jnp.ndarray  # [n_buckets, 1]
    kind: str


def num_buckets(n: int, bucket_size: int = DEFAULT_BUCKET_SIZE) -> int:
    return -(-n // bucket_size)


def to_buckets(
    x: jnp.ndarray, bucket_size: int = DEFAULT_BUCKET_SIZE
) -> Tuple[jnp.ndarray, int]:
    """Flatten ``x`` and reshape to ``[n_buckets, bucket_size]``.

    Returns the bucket matrix and the original element count. The tail bucket
    is padded by repeating the final element ('edge' mode) so that bucket
    statistics (min / max / absmax) are unaffected by padding.
    """
    flat = x.reshape(-1)
    n = flat.shape[0]
    nb = num_buckets(n, bucket_size)
    pad = nb * bucket_size - n
    if pad:
        flat = jnp.pad(flat, (0, pad), mode="edge")
    return flat.reshape(nb, bucket_size), n


def from_buckets(buckets: jnp.ndarray, n: int, shape: Tuple[int, ...]) -> jnp.ndarray:
    """Inverse of :func:`to_buckets`: strip padding, restore shape."""
    return buckets.reshape(-1)[:n].reshape(shape)


def compute_scale(buckets: jnp.ndarray, kind: str = LINEAR) -> ScaleParams:
    """Per-bucket scaling constants mapping each bucket into [0, 1].

    Degenerate (constant / all-zero) buckets get ``scale = 1`` so the forward
    and inverse transforms stay finite; their elements all map to offset → 0.
    """
    if kind not in _SCALINGS:
        raise ValueError(f"unknown scaling kind {kind!r}; expected one of {_SCALINGS}")
    if kind == LINEAR:
        lo = jnp.min(buckets, axis=1, keepdims=True)
        hi = jnp.max(buckets, axis=1, keepdims=True)
        rng = hi - lo
        scale = jnp.where(rng > 0, rng, jnp.ones_like(rng))
        return ScaleParams(offset=lo, scale=scale, kind=kind)
    amax = jnp.max(jnp.abs(buckets), axis=1, keepdims=True)
    scale = jnp.where(amax > 0, 2.0 * amax, jnp.ones_like(amax))
    return ScaleParams(offset=-jnp.abs(amax), scale=scale, kind=kind)


def apply_scale(buckets: jnp.ndarray, sp: ScaleParams) -> jnp.ndarray:
    """``[n_buckets, B]`` → scaled values in [0, 1]."""
    return (buckets - sp.offset) / sp.scale


def invert_scale(scaled01: jnp.ndarray, sp: ScaleParams) -> jnp.ndarray:
    """Inverse of :func:`apply_scale`."""
    return scaled01 * sp.scale + sp.offset


def floats_per_bucket(kind: str) -> int:
    """Scaling-constant overhead per bucket, for size accounting.

    Matches the reference's accounting (2 fp values / 256-weight bucket for
    linear min/max scaling; abs-max needs only the single max value).
    """
    if kind not in _SCALINGS:
        raise ValueError(f"unknown scaling kind {kind!r}")
    return 2 if kind == LINEAR else 1
