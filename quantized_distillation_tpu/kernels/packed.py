"""Packed weight containers and the kernel-friendly HBM layout.

Converts trained (fake-quant) weights into the deployment format the Pallas
kernels consume: sub-byte levels packed into uint8 resident in HBM plus
per-bucket scaling constants. This is the executable counterpart of what the
reference only *accounts for* (``helpers/functions.py`` size math) — here the
packed form is what serving actually reads, cutting HBM traffic 4-16x.

Layout (chosen for in-kernel unpack cost, see ``dequant_matmul.py``):

- A weight matrix W[K, N] is bucketed along N (row-major flatten order, the
  same 256-element buckets as :mod:`..ops.bucketing` when N % 256 == 0).
- Within each 256-wide bucket, values are packed *planar*: byte ``i`` of the
  bucket holds the levels of columns ``i, i + 256/f, ... `` (f = 8/bits values
  per byte, value ``t`` in bit field ``[t*bits, (t+1)*bits)``). Unpacking a
  bucket is then f shift-mask ops + a lane-dim concat — no interleaving
  reshuffle on the VPU.
- ``scale``/``offset`` are [K, N/256] f32; for the uniform grid the
  1/(2^bits - 1) dequant factor is folded into ``scale`` at pack time, so the
  kernel computes ``w = levels * scale + offset`` as one fused multiply-add.
- Codebook weights store raw indices plus the points vector; the kernel
  looks levels up in the LUT before the same affine.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.bucketing import LINEAR, compute_scale
from ..ops.codebook import nearest_point_idx
from ..ops.uniform import quantize_levels_01

BUCKET = 256


class PackedLinear(struct.PyTreeNode):
    """A [K, N] weight matrix in packed deployment form.

    ``bits``/``shape`` are static pytree metadata so jitted consumers can
    branch on them at trace time.
    """

    packed: jnp.ndarray  # uint8 [K, N * bits // 8]
    # Per-bucket affine constants, stored TRANSPOSED [n_buckets, K] so the
    # kernel can read bucket j's row with a dynamic sublane index (Mosaic
    # forbids dynamic lane indexing). Dequant factor folded in for uniform.
    scale: jnp.ndarray  # f32 [N // 256, K]
    offset: jnp.ndarray  # f32 [N // 256, K]
    bits: int = struct.field(pytree_node=False)  # CONTAINER bits (unpack width)
    shape: Tuple[int, int] = struct.field(pytree_node=False)  # logical (K, N)
    group: int = struct.field(pytree_node=False, default=1)  # buckets/grid step
    points: Optional[jnp.ndarray] = None  # [2^bits] codebook (None = uniform)
    bias: Optional[jnp.ndarray] = None  # [N] f32
    # True QUANTIZATION bit width when it differs from the container
    # (store_bits=8 byte layout); None = same as ``bits``.
    quant_bits: Optional[int] = struct.field(pytree_node=False, default=None)

    @property
    def effective_quant_bits(self) -> int:
        return self.quant_bits if self.quant_bits is not None else self.bits

    @property
    def n_padded(self) -> int:
        return self.scale.shape[0] * BUCKET


MAX_GROUP = 8


def bucket_group(
    bits: int, n: Optional[int] = None, max_group: Optional[int] = None
) -> int:
    """Buckets processed per kernel grid step.

    Two constraints drive the group size:
    - the packed-byte block's lane dim must be >= 128 on TPU (a 2-bit bucket
      is only 64 bytes → at least 2 buckets per step), and
    - per-grid-step fixed overhead is ~2us (measured) — grouping buckets per
      step amortizes it while bounding padding waste for narrow matrices.

    ``max_group`` overrides the default cap: wide serving matrices (the
    vocab generator) measure fastest at 32 buckets/step at the FULL decode
    step (round-4 step-level sweep, `topk_fused.pick_generator_group`
    docstring; earlier standalone probes preferred 16 — probe chains
    pipeline cross-invocation DMA). The default stays 8 — safe for any M.
    """
    bpb = BUCKET * bits // 8
    min_g = -(-128 // bpb)
    if n is None:
        return min_g
    nb = -(-n // BUCKET)
    return max(min_g, min(max_group or MAX_GROUP, nb))


def _pad_cols(w: jnp.ndarray, bits: int, max_group: Optional[int] = None) -> jnp.ndarray:
    k, n = w.shape
    pad = (-n) % (BUCKET * bucket_group(bits, n, max_group))
    if pad:
        # edge-pad so padding never widens a bucket's min/max range
        w = jnp.pad(w, ((0, 0), (0, pad)), mode="edge")
    return w


def _plane_pack(levels: jnp.ndarray, bits: int) -> jnp.ndarray:
    """[K, N] int levels → [K, N*bits/8] uint8 in planar-per-bucket layout."""
    k, n = levels.shape
    f = 8 // bits
    plane = n // (BUCKET) * (BUCKET // f)
    # [K, n_buckets, f, 256/f]: value t of byte i lives at col i + t*(256/f)
    lv = levels.reshape(k, n // BUCKET, f, BUCKET // f).astype(jnp.uint8)
    packed = jnp.zeros((k, n // BUCKET, BUCKET // f), jnp.uint8)
    for t in range(f):
        packed = packed | (lv[:, :, t, :] << (t * bits))
    return packed.reshape(k, n // f)


def plane_unpack(packed: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Inverse of :func:`_plane_pack` (jnp reference; kernels do this inline)."""
    k, nb = packed.shape
    f = 8 // bits
    mask = jnp.uint8((1 << bits) - 1)
    pb = packed.reshape(k, nb // (BUCKET // f), BUCKET // f)
    planes = [((pb >> (t * bits)) & mask) for t in range(f)]
    return jnp.stack(planes, axis=2).reshape(k, nb * f).astype(jnp.int32)


def pack_linear(
    w: jnp.ndarray,
    bits: int,
    *,
    scaling: str = LINEAR,
    points: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    lut_mode: str = "exact",
    max_group: Optional[int] = None,
    store_bits: Optional[int] = None,
) -> PackedLinear:
    """Quantize + pack a [K, N] weight matrix for serving.

    With ``points`` given, levels are nearest-codebook indices and the LUT is
    stored; otherwise levels are the uniform grid (dequant factor folded into
    ``scale``).

    ``lut_mode`` (codebook only):
    - ``"exact"``: store raw indices + the LUT; the kernel pays 2^bits
      select-accumulate passes per tile (measured ~6x slower than uniform).
    - ``"requant8"``: snap the codebook *values* onto the uniform 8-bit grid
      and ship as a uniform int8 matrix — adds at most 1/510 of the bucket
      range of extra error (far below 2/4-bit point spacing), costs 2-4x the
      HBM bytes of the index form, and runs at full uniform-kernel speed.
      The Huffman size accounting still uses the true index stream.

    ``store_bits=8`` (uniform only): keep the ``bits``-level quantization
    DECISIONS but store one level per byte — dequant values are bit-exact
    vs the sub-byte container (the 1/(2^bits-1) fold rides ``scale``), HBM
    weight bytes double (still 4x under f32 at 4-bit), and the kernel's
    per-bucket unpack collapses from f shift-mask-concat passes to a plain
    byte read. A serving-layout speed/VPU knob; checkpoint compression
    accounting is unaffected (it uses the true index stream).
    """
    if w.ndim != 2:
        raise ValueError(f"pack_linear expects a matrix, got shape {w.shape}")
    sb = bits if store_bits is None else store_bits
    if sb != bits:
        if points is not None:
            raise ValueError(
                "store_bits applies to the uniform grid; codebooks use "
                "lut_mode='requant8'"
            )
        if sb != 8:
            raise ValueError(f"store_bits must be 8 (one level/byte), got {sb}")
    k, n = w.shape
    if points is not None and lut_mode == "requant8":
        wp = _pad_cols(w, 8, max_group)
        buckets = wp.reshape(k * wp.shape[1] // BUCKET, BUCKET)
        sp = compute_scale(buckets, scaling)
        x01 = (buckets - sp.offset) / sp.scale
        idx = nearest_point_idx(x01, jax.lax.stop_gradient(points))
        vals01 = jnp.clip(points[idx], 0.0, 1.0)
        levels = quantize_levels_01(vals01, 8)
        scale_eff = sp.scale / 255.0
        nb = wp.shape[1] // BUCKET
        return PackedLinear(
            packed=_plane_pack(levels.reshape(k, wp.shape[1]), 8),
            scale=scale_eff.reshape(k, nb).T,
            offset=sp.offset.reshape(k, nb).T,
            bits=8,
            shape=(k, n),
            group=bucket_group(8, n, max_group),
            points=None,
            bias=None if bias is None else jnp.asarray(bias, jnp.float32),
        )
    wp = _pad_cols(w, sb, max_group)
    buckets = wp.reshape(k * wp.shape[1] // BUCKET, BUCKET)
    sp = compute_scale(buckets, scaling)
    x01 = (buckets - sp.offset) / sp.scale
    if points is not None:
        levels = nearest_point_idx(x01, jax.lax.stop_gradient(points))
        scale_eff = sp.scale
    else:
        # quantization decisions at `bits`; container width at `sb` — the
        # grid fold always divides by the QUANT grid size, so a byte-stored
        # 4-bit matrix dequantizes bit-identically to the packed one
        levels = quantize_levels_01(x01, bits)
        scale_eff = sp.scale / ((1 << bits) - 1)
    nb = wp.shape[1] // BUCKET
    return PackedLinear(
        packed=_plane_pack(levels.reshape(k, wp.shape[1]), sb),
        scale=scale_eff.reshape(k, nb).T,
        offset=sp.offset.reshape(k, nb).T,
        bits=sb,
        shape=(k, n),
        group=bucket_group(sb, n, max_group),
        points=None if points is None else jnp.asarray(points, jnp.float32),
        bias=None if bias is None else jnp.asarray(bias, jnp.float32),
        quant_bits=None if sb == bits else bits,
    )


def dequantize_linear(p: PackedLinear, dtype=jnp.float32) -> jnp.ndarray:
    """Packed → dense [K, N] weights (jnp reference path / golden model)."""
    levels = plane_unpack(p.packed, p.bits)  # [K, Npad]
    k, npad = levels.shape
    lv = levels.reshape(k, npad // BUCKET, BUCKET)
    if p.points is not None:
        vals = p.points[lv]
    else:
        vals = lv.astype(jnp.float32)
    w = vals * p.scale.T[:, :, None] + p.offset.T[:, :, None]
    return w.reshape(k, npad)[:, : p.shape[1]].astype(dtype)
