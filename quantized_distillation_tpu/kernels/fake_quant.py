"""Fused bucketed fake-quant Pallas kernel for the STE train step.

The KD train step fake-quantizes every student weight each step
(``train/quantize_tree.py``; reference ``cnn_models/help_fun.py`` did the
same as a Python stash/overwrite/restore dance). Under XLA the jnp pipeline
(reshape → per-bucket min/max reduce → scale → round → dequant) compiles to
one reduce pass plus one elementwise pass over the weights — ~2 reads +
1 write of every parameter byte per step, measured at 12–17% of the 4-bit
KD step on the seq2seq/WRN families (BASELINE.md round 3). This kernel does
the whole thing in a single pass: each [row_tile, bucket_size] block is
read once, reduced in VMEM (cross-lane min/max), requantized, and written
once — 1 read + 1 write.

Numerics: the same f32 formula as :func:`..ops.uniform.fake_quant`'s
deterministic path (``(x - off) / scale``, ``round``, ``clip``,
``q/s * scale + off``) — quantization LEVELS are always identical; dequant
values can differ by 1 ulp from the jnp path (fma ordering differs between
lowerings). Stochastic rounding stays on the jnp path (it needs the
caller's JAX PRNG semantics).

Used automatically by ``ops.uniform.fake_quant`` on TPU backends for
deterministic rounding; everything else falls back to jnp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.bucketing import ABSMAX, LINEAR

LANES = 128


def _fq_kernel(x_ref, out_ref, *, bits, scaling):
    xb = x_ref[:]  # [T, bucket_size] f32
    if scaling == LINEAR:
        lo = jnp.min(xb, axis=1, keepdims=True)
        hi = jnp.max(xb, axis=1, keepdims=True)
        rng = hi - lo
        scale = jnp.where(rng > 0, rng, jnp.ones_like(rng))
        off = lo
    elif scaling == ABSMAX:
        amax = jnp.max(jnp.abs(xb), axis=1, keepdims=True)
        scale = jnp.where(amax > 0, 2.0 * amax, jnp.ones_like(amax))
        off = -jnp.abs(amax)
    else:  # pragma: no cover - validated by caller
        raise ValueError(f"unknown scaling {scaling!r}")
    s = (1 << bits) - 1
    x01 = (xb - off) / scale
    q = jnp.clip(jnp.round(x01 * s), 0.0, float(s))
    out_ref[:] = (q * (1.0 / s)) * scale + off


@functools.partial(
    jax.jit, static_argnames=("bits", "scaling", "row_tile", "interpret")
)
def fake_quant_buckets_pallas(
    buckets: jnp.ndarray,
    bits: int,
    *,
    scaling: str = LINEAR,
    row_tile: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """[n_buckets, bucket_size] f32 → fake-quantized, one HBM pass.

    Rows (buckets) are independent, so the grid tiles them; the ragged last
    block is safe (per-row math, surplus rows dropped on store).
    """
    nb, bs = buckets.shape
    if bs % LANES:
        raise ValueError(f"bucket_size {bs} must be a multiple of {LANES}")
    t = min(row_tile, max(8, nb))
    grid = (pl.cdiv(nb, t),)
    return pl.pallas_call(
        functools.partial(_fq_kernel, bits=bits, scaling=scaling),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t, bs), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (t, bs), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nb, bs), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=8 * nb * bs, bytes_accessed=2 * 4 * nb * bs, transcendentals=0
        ),
        interpret=interpret,
    )(buckets.astype(jnp.float32))
