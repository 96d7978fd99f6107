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
bucket. The reduction dim is tiled: K <= 2048 stays whole in VMEM (our
models' dims are <= ~1.5k); larger K runs a second (innermost) grid axis
with f32 accumulation in the output block, so any student size fits.

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


def _vmem_limit_bytes() -> int:
    """Mosaic scoped-VMEM limit for the packed kernels (default 48 MB; the
    Mosaic default of 16 MB is too small for the pipelined/grouped bodies
    at serving shapes, and 32 MB still compile-OOMs rows=1280 at group 16
    — measured round 5: 48 MB unlocks B=256/group16 at 730.9k tokens/s vs
    706.5k at group 8, while the B=128 headline numbers are unchanged
    under 48 MB). v5e has 128 MB physical VMEM. Override via
    QDT_TOPK_VMEM_MB for probes."""
    import os

    return int(os.environ.get("QDT_TOPK_VMEM_MB", "48")) * 1024 * 1024


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
    x_ref, w_ref, s_ref, o_ref, out_ref, *, bits, group, compute_dtype, k_tiled
):
    """One 256-column bucket: out = (x * s_j) @ levels + (x · o_j).

    Because every column n of bucket j shares the same per-row affine
    ``w[k,n] = levels[k,n] * s[j,k] + o[j,k]``, the scale folds into the
    *activations* (one [M,K] VPU multiply) and the offset becomes a lane
    reduction ``Σ_k x[m,k] o[j,k]`` broadcast over the bucket — the MXU then
    consumes raw integer levels. s/o rows are read with a dynamic *sublane*
    index (dynamic lane indexing is not lowerable on TPU).

    With ``k_tiled`` the grid has an innermost K axis: the output block is
    revisited per K tile and accumulated in f32 (zeroed on the first visit);
    the per-bucket affine is exact per tile because scale/offset are per-K-row
    constants, so partial sums are additive.
    """
    bg = group
    x = x_ref[:]
    bpb = BUCKET * bits // 8  # bytes per bucket
    if k_tiled:

        @pl.when(pl.program_id(1) == 0)
        def _init():
            out_ref[:] = jnp.zeros_like(out_ref)

    for b in range(bg):  # static unroll over the bucket group
        levels = _unpack_bucket(w_ref[:, b * bpb : (b + 1) * bpb], bits)
        s_row = s_ref[pl.ds(b, 1), :]  # [1, Kt]
        o_row = o_ref[pl.ds(b, 1), :]  # [1, Kt]
        xs = (x * s_row).astype(compute_dtype)
        acc = jnp.dot(
            xs,
            levels.astype(compute_dtype),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(compute_dtype),
        )
        offterm = jnp.sum(x * o_row, axis=1, keepdims=True)  # [M, 1]
        cols = slice(b * BUCKET, (b + 1) * BUCKET)
        if k_tiled:
            out_ref[:, cols] += acc + offterm
        else:
            out_ref[:, cols] = acc + offterm


def _codebook_kernel(
    x_ref, w_ref, s_ref, o_ref, pts_ref, out_ref, *,
    bits, group, compute_dtype, k_tiled,
):
    """Codebook variant: levels index an SMEM LUT (select-accumulate — no
    general VMEM gather on TPU; 2^bits fully-vectorized VPU passes), then the
    same activation-side affine as the uniform kernel."""
    bg = group
    s = 1 << bits
    x = x_ref[:]
    bpb = BUCKET * bits // 8
    if k_tiled:

        @pl.when(pl.program_id(1) == 0)
        def _init():
            out_ref[:] = jnp.zeros_like(out_ref)

    for b in range(bg):
        levels = _unpack_bucket(w_ref[:, b * bpb : (b + 1) * bpb], bits)
        # static unroll (vs fori_loop): lets Mosaic software-pipeline the
        # s compare+select passes instead of serializing loop iterations
        vals = jnp.zeros(levels.shape, jnp.float32)
        for jj in range(s):
            vals = vals + jnp.where(levels == jj, pts_ref[jj], 0.0)
        s_row = s_ref[pl.ds(b, 1), :]
        o_row = o_ref[pl.ds(b, 1), :]
        xs = (x * s_row).astype(compute_dtype)
        acc = jnp.dot(
            xs,
            vals.astype(compute_dtype),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(compute_dtype),
        )
        part = acc + jnp.sum(x * o_row, axis=1, keepdims=True)
        cols = slice(b * BUCKET, (b + 1) * BUCKET)
        if k_tiled:
            out_ref[:, cols] += part
        else:
            out_ref[:, cols] = part


def _sublane(dtype) -> int:
    return 16 if dtype == jnp.bfloat16 else 8


K_TILE_MAX = 2048  # largest reduction slab kept whole in VMEM


def pick_k_tile(k: int, k_tile: Optional[int]) -> int:
    """Reduction-dim tile: explicit (must divide K, multiple of 8) or the
    largest power-of-two split of K that fits the VMEM slab budget; if the
    power-of-two ladder bottoms out above the budget (odd factor, e.g.
    K=2^a*odd), fall back to the largest 8-aligned divisor <= K_TILE_MAX
    rather than silently keeping a >K_TILE_MAX slab in VMEM."""
    if k_tile is not None:
        if k % k_tile or k_tile % 8:
            raise ValueError(f"k_tile={k_tile} must divide K={k} and be 8-aligned")
        return k_tile
    tk = k
    while tk > K_TILE_MAX and tk % 2 == 0:
        tk //= 2
    if tk > K_TILE_MAX:
        for d in range(K_TILE_MAX, 0, -8):
            if k % d == 0:
                return d
        raise ValueError(
            f"K={k} has no 8-aligned divisor <= {K_TILE_MAX}; pad K or pass k_tile"
        )
    return tk


@functools.partial(
    jax.jit,
    static_argnames=("compute_dtype", "interpret", "use_pallas", "k_tile"),
)
def dequant_matmul(
    x: jnp.ndarray,
    p: PackedLinear,
    *,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    use_pallas: bool = True,
    k_tile: Optional[int] = None,
) -> jnp.ndarray:
    """x [M, K] @ dequant(p) [K, N] (+ bias) → [M, N] float32.

    Pads M up to the sublane multiple, runs the grid over N buckets, strips
    padding. K larger than ``K_TILE_MAX`` (or an explicit ``k_tile``) adds an
    innermost reduction-grid axis with f32 accumulation in the output block.
    Falls back to the jnp reference when ``use_pallas=False``.
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
    tk = pick_k_tile(k, k_tile)
    nk = k // tk
    # K is the innermost grid axis so the output block is revisited and
    # accumulated across reduction tiles (Pallas revisiting semantics).
    grid = (nb // bg, nk)
    group_bytes = bg * BUCKET // f
    in_specs = [
        pl.BlockSpec((mpad, tk), lambda j, kk: (0, kk), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (tk, group_bytes), lambda j, kk: (kk, j), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((bg, tk), lambda j, kk: (j, kk), memory_space=pltpu.VMEM),
        pl.BlockSpec((bg, tk), lambda j, kk: (j, kk), memory_space=pltpu.VMEM),
    ]
    operands = [xp, p.packed, p.scale, p.offset]
    kargs = dict(
        bits=p.bits, group=bg, compute_dtype=compute_dtype, k_tiled=nk > 1
    )
    if p.points is not None:
        kernel = functools.partial(_codebook_kernel, **kargs)
        in_specs.append(
            pl.BlockSpec(
                (1 << p.bits,), lambda j, kk: (0,), memory_space=pltpu.SMEM
            )
        )
        operands.append(p.points)
    else:
        kernel = functools.partial(_uniform_kernel, **kargs)
    flops = 2 * mpad * k * npad
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (mpad, bg * BUCKET), lambda j, kk: (0, j), memory_space=pltpu.VMEM
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
        # Mosaic's default scoped-VMEM limit (16MB) is too small for the
        # [M, group*256] f32 output block at serving shapes once the
        # generator group is 32 (e.g. M=320: 22.8MB needed) — raise it like
        # the fused kernel does (same env override).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes()
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
