"""Fused dequantize(+LUT)+matmul Pallas TPU kernels.

The serving hot path: activations [M, K] times a packed quantized weight
matrix [K, N] whose INT2/4/8 levels live in HBM (see :mod:`.packed` for the
layout). Per grid step the kernel streams one 256-column bucket of packed
bytes into VMEM, unpacks with shift/mask on the VPU, applies the per-bucket
affine ``w = levels * scale + offset`` (uniform grid: dequant factor folded
into ``scale``; codebook: levels index an SMEM-resident LUT first), and feeds
the MXU — so HBM traffic is ``bits/32`` of the FP32 path, which is the whole
serving-throughput win (BASELINE north-star: >= 3x FP32 tokens/s).

Why this shape: bucket size 256 = 2 x 128 lanes aligns buckets exactly with
lane tiling; the planar in-bucket pack order makes unpack a lane-dim
concatenate (no interleave shuffle); scale/offset broadcast [K, 1] over the
bucket; K stays whole in VMEM (our models' reduction dims are <= ~1.5k).

The pure-jnp reference path (``dequant_matmul_reference``) is the golden
model for tests and the CPU fallback.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .packed import BUCKET, PackedLinear, dequantize_linear


def _dot_precision(compute_dtype):
    """f32 compute requests HIGHEST (3-pass bf16 on the MXU, ~f32 accurate);
    bf16 compute uses the fast default single pass."""
    return (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _unpack_bucket(pb: jnp.ndarray, bits: int) -> jnp.ndarray:
    """[K, 256/f] uint8 → [K, 256] int32 levels (planar layout: concat)."""
    f = 8 // bits
    mask = (1 << bits) - 1
    pi = pb.astype(jnp.int32)
    parts = [(pi >> (t * bits)) & mask for t in range(f)]
    return jnp.concatenate(parts, axis=1) if f > 1 else parts[0]


def _uniform_kernel(
    x_ref, w_ref, s_ref, o_ref, out_ref, *, bits, group, compute_dtype
):
    """One 256-column bucket: out = (x * s_j) @ levels + (x · o_j).

    Because every column n of bucket j shares the same per-row affine
    ``w[k,n] = levels[k,n] * s[j,k] + o[j,k]``, the scale folds into the
    *activations* (one [M,K] VPU multiply) and the offset becomes a lane
    reduction ``Σ_k x[m,k] o[j,k]`` broadcast over the bucket — the MXU then
    consumes raw integer levels. s/o rows are read with a dynamic *sublane*
    index (dynamic lane indexing is not lowerable on TPU).
    """
    j = pl.program_id(0)
    bg = group
    x = x_ref[:]
    bpb = BUCKET * bits // 8  # bytes per bucket
    for b in range(bg):  # static unroll over the bucket group
        levels = _unpack_bucket(w_ref[:, b * bpb : (b + 1) * bpb], bits)
        s_row = s_ref[pl.ds(j * bg + b, 1), :]  # [1, K]
        o_row = o_ref[pl.ds(j * bg + b, 1), :]  # [1, K]
        xs = (x * s_row).astype(compute_dtype)
        acc = jnp.dot(
            xs,
            levels.astype(compute_dtype),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(compute_dtype),
        )
        offterm = jnp.sum(x * o_row, axis=1, keepdims=True)  # [M, 1]
        out_ref[:, b * BUCKET : (b + 1) * BUCKET] = acc + offterm


def _codebook_kernel(
    x_ref, w_ref, s_ref, o_ref, pts_ref, out_ref, *, bits, group, compute_dtype
):
    """Codebook variant: levels index an SMEM LUT (select-accumulate — no
    general VMEM gather on TPU; 2^bits fully-vectorized VPU passes), then the
    same activation-side affine as the uniform kernel."""
    j = pl.program_id(0)
    bg = group
    s = 1 << bits
    x = x_ref[:]
    bpb = BUCKET * bits // 8
    for b in range(bg):
        levels = _unpack_bucket(w_ref[:, b * bpb : (b + 1) * bpb], bits)
        # static unroll (vs fori_loop): lets Mosaic software-pipeline the
        # s compare+select passes instead of serializing loop iterations
        vals = jnp.zeros(levels.shape, jnp.float32)
        for jj in range(s):
            vals = vals + jnp.where(levels == jj, pts_ref[jj], 0.0)
        s_row = s_ref[pl.ds(j * bg + b, 1), :]
        o_row = o_ref[pl.ds(j * bg + b, 1), :]
        xs = (x * s_row).astype(compute_dtype)
        acc = jnp.dot(
            xs,
            vals.astype(compute_dtype),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(compute_dtype),
        )
        out_ref[:, b * BUCKET : (b + 1) * BUCKET] = acc + jnp.sum(
            x * o_row, axis=1, keepdims=True
        )


def _sublane(dtype) -> int:
    return 16 if dtype == jnp.bfloat16 else 8


@functools.partial(
    jax.jit, static_argnames=("compute_dtype", "interpret", "use_pallas")
)
def dequant_matmul(
    x: jnp.ndarray,
    p: PackedLinear,
    *,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    use_pallas: bool = True,
) -> jnp.ndarray:
    """x [M, K] @ dequant(p) [K, N] (+ bias) → [M, N] float32.

    Pads M up to the sublane multiple, runs the grid over N buckets, strips
    padding. Falls back to the jnp reference when ``use_pallas=False``.
    """
    if not use_pallas:
        return dequant_matmul_reference(x, p, compute_dtype=compute_dtype)
    m, k = x.shape
    if k != p.shape[0]:
        raise ValueError(f"x K={k} vs packed K={p.shape[0]}")
    if k % 8:
        raise ValueError(f"reduction dim K={k} must be a multiple of 8")
    npad = p.n_padded
    f = 8 // p.bits
    tm = _sublane(compute_dtype)
    mpad = -(-m // tm) * tm
    xp = jnp.pad(x, ((0, mpad - m), (0, 0))) if mpad != m else x

    bg = p.group
    nb = npad // BUCKET
    if nb % bg:
        raise ValueError(f"buckets {nb} not divisible by group {bg}")
    grid = (nb // bg,)
    group_bytes = bg * BUCKET // f
    in_specs = [
        pl.BlockSpec((mpad, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, group_bytes), lambda j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [xp, p.packed, p.scale, p.offset]
    if p.points is not None:
        kernel = functools.partial(
            _codebook_kernel, bits=p.bits, group=bg, compute_dtype=compute_dtype
        )
        in_specs.append(
            pl.BlockSpec((1 << p.bits,), lambda j: (0,), memory_space=pltpu.SMEM)
        )
        operands.append(p.points)
    else:
        kernel = functools.partial(
            _uniform_kernel, bits=p.bits, group=bg, compute_dtype=compute_dtype
        )
    flops = 2 * mpad * k * npad
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (mpad, bg * BUCKET), lambda j: (0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mpad, npad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=xp.size * xp.dtype.itemsize
            + p.packed.size
            + 8 * p.scale.size
            + 4 * mpad * npad,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    out = out[:m, : p.shape[1]]
    if p.bias is not None:
        out = out + p.bias
    return out


def dequant_matmul_reference(
    x: jnp.ndarray, p: PackedLinear, *, compute_dtype=jnp.float32
) -> jnp.ndarray:
    """Golden jnp path: dense dequant then matmul (also the CPU fallback)."""
    w = dequantize_linear(p, dtype=compute_dtype)
    out = jnp.dot(
        x.astype(compute_dtype), w, preferred_element_type=jnp.float32
    )
    if p.bias is not None:
        out = out + p.bias
    return out
