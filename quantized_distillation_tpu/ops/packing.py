"""Sub-byte bit-packing of quantization levels/indices.

The reference stores quantized models as full torch tensors and only *accounts*
for compressed size (``helpers/functions.py``). Here packing is real: INT2/4/8
levels are packed into uint8 words that live in HBM and are unpacked in-register
inside the Pallas dequant+matmul kernels (:mod:`..kernels`), cutting HBM traffic
by 4-16x vs fp32 weights — the source of the serving-throughput win.

Layout: values are packed along the *last* axis, ``8 // bits`` values per byte,
value ``k`` in bits ``[k*bits, (k+1)*bits)`` (little-endian within the byte).
This keeps unpacking a cheap shift+mask on the VPU and keeps the lane dimension
contiguous for matmul tiling.
"""

from __future__ import annotations

import jax.numpy as jnp


def values_per_byte(bits: int) -> int:
    if bits not in (2, 4, 8):
        raise ValueError(f"bits must be 2, 4 or 8; got {bits}")
    return 8 // bits


def pack(levels: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Pack integer levels in ``[0, 2^bits)`` into uint8 along the last axis.

    The last axis length must be a multiple of ``8 // bits`` (bucket size 256
    always is).
    """
    f = values_per_byte(bits)
    *lead, k = levels.shape
    if k % f:
        raise ValueError(f"last axis {k} not a multiple of {f} for {bits}-bit packing")
    v = levels.astype(jnp.uint8).reshape(*lead, k // f, f)
    packed = jnp.zeros(v.shape[:-1], dtype=jnp.uint8)
    for i in range(f):
        packed = packed | (v[..., i] << (i * bits))
    return packed


def unpack(packed: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Inverse of :func:`pack`: uint8 → int32 levels, last axis grows by 8/bits."""
    f = values_per_byte(bits)
    mask = jnp.uint8((1 << bits) - 1)
    parts = [((packed >> (i * bits)) & mask).astype(jnp.int32) for i in range(f)]
    stacked = jnp.stack(parts, axis=-1)
    *lead, k, _ = stacked.shape
    return stacked.reshape(*lead, k * f)
