"""Uniform bucketed fake-quantization with a straight-through estimator.

Re-designs the reference's ``uniformQuantization`` (``quantization/__init__.py``):
bucket the flattened tensor (bucket size 256), scale each bucket into [0, 1],
snap to the uniform grid ``k / s`` with ``s = 2^bits - 1`` intervals
(deterministic round-to-nearest or stochastic rounding), and scale back.

Differences from the torch reference, by design:

- Pure functional: no in-place ``param.data`` mutation. The STE is expressed
  once, algebraically (``x + stop_grad(q(x) - x)``), instead of the reference's
  stash/quantize/forward/restore dance in the train loop
  (``cnn_models/help_fun.py``); under ``jax.grad`` the gradient flows to the
  full-precision master weights automatically.
- Shape-static and jit-safe: runs inside the compiled train step, where XLA
  fuses the reshape + per-bucket reductions with the surrounding compute.
- Stochastic rounding takes an explicit PRNG key (functional randomness).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .bucketing import (
    DEFAULT_BUCKET_SIZE,
    LINEAR,
    ScaleParams,
    apply_scale,
    compute_scale,
    from_buckets,
    invert_scale,
    to_buckets,
)


class QuantizedTensor(NamedTuple):
    """A tensor quantized to integer levels plus per-bucket scaling params.

    ``levels`` holds integers in ``[0, 2^bits - 1]`` (stored as int32 before
    packing — see :mod:`.packing`), laid out as ``[n_buckets, bucket_size]``.
    """

    levels: jnp.ndarray  # int32 [n_buckets, bucket_size]
    scale: ScaleParams
    bits: int
    shape: Tuple[int, ...]
    n: int  # number of real (non-padding) elements


def quantize_levels_01(
    x01: jnp.ndarray,
    bits: int,
    *,
    stochastic: bool = False,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Scaled values in [0,1] → integer grid levels in [0, 2^bits - 1].

    Deterministic: round-to-nearest. Stochastic: ``floor(v * s + u)`` with
    ``u ~ U[0,1)``, which is unbiased (``E[q/s] = v``) — the property the
    reference's stochastic rounding option provides.
    """
    s = (1 << bits) - 1
    v = x01 * s
    if stochastic:
        if key is None:
            raise ValueError("stochastic rounding requires a PRNG key")
        u = jax.random.uniform(key, v.shape, dtype=v.dtype)
        q = jnp.floor(v + u)
    else:
        q = jnp.round(v)
    return jnp.clip(q, 0, s).astype(jnp.int32)


def dequantize_levels_01(levels: jnp.ndarray, bits: int, dtype=jnp.float32) -> jnp.ndarray:
    """Integer levels → grid values in [0, 1]."""
    s = (1 << bits) - 1
    return levels.astype(dtype) * (1.0 / s)


def quantize(
    x: jnp.ndarray,
    bits: int,
    *,
    bucket_size: int = DEFAULT_BUCKET_SIZE,
    scaling: str = LINEAR,
    stochastic: bool = False,
    key: Optional[jax.Array] = None,
) -> QuantizedTensor:
    """Full uniform quantization: tensor → integer levels + bucket scales."""
    buckets, n = to_buckets(x, bucket_size)
    sp = compute_scale(buckets, scaling)
    x01 = apply_scale(buckets, sp)
    levels = quantize_levels_01(x01, bits, stochastic=stochastic, key=key)
    return QuantizedTensor(levels=levels, scale=sp, bits=bits, shape=tuple(x.shape), n=n)


def dequantize(qt: QuantizedTensor, dtype=jnp.float32) -> jnp.ndarray:
    """Integer levels + scales → fake-quantized tensor in original shape."""
    x01 = dequantize_levels_01(qt.levels, qt.bits, dtype)
    buckets = invert_scale(x01, qt.scale)
    return from_buckets(buckets, qt.n, qt.shape).astype(dtype)


def fake_quant(
    x: jnp.ndarray,
    bits: int,
    *,
    bucket_size: int = DEFAULT_BUCKET_SIZE,
    scaling: str = LINEAR,
    stochastic: bool = False,
    key: Optional[jax.Array] = None,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Quantize-dequantize roundtrip (no gradient definition).

    Equivalent to the value the reference writes into ``param.data`` each step.

    On TPU backends the deterministic path runs through the single-pass
    Pallas kernel (:mod:`..kernels.fake_quant` — 1 read + 1 write of the
    weights instead of XLA's reduce-pass + elementwise-pass; numerically
    identical formula). ``use_pallas`` overrides the automatic choice;
    stochastic rounding and non-lane-aligned bucket sizes always take the
    jnp path.
    """
    if use_pallas is None:
        use_pallas = (
            not stochastic
            and jax.default_backend() == "tpu"
            and bucket_size % 128 == 0
            and x.size >= bucket_size
        )
    if use_pallas and not stochastic and bucket_size % 128 == 0:
        from ..kernels.fake_quant import fake_quant_buckets_pallas

        # detach the kernel input: fake_quant has no gradient of its own
        # (the STE wrapper routes gradients around it), and a pallas_call
        # with no registered JVP fails linearization even inside a
        # stop_gradient REGION — detaching the input keeps the call out of
        # the autodiff graph entirely
        buckets, n = to_buckets(jax.lax.stop_gradient(x), bucket_size)
        qb = fake_quant_buckets_pallas(
            buckets, bits, scaling=scaling,
            # explicit use_pallas=True on a CPU backend runs the kernel in
            # interpret mode (tests exercise the real code path everywhere)
            interpret=jax.default_backend() == "cpu",
        )
        return from_buckets(qb, n, tuple(x.shape)).astype(x.dtype)
    return dequantize(
        quantize(
            x,
            bits,
            bucket_size=bucket_size,
            scaling=scaling,
            stochastic=stochastic,
            key=key,
        ),
        dtype=x.dtype,
    )


def ste_fake_quant(
    x: jnp.ndarray,
    bits: int,
    *,
    bucket_size: int = DEFAULT_BUCKET_SIZE,
    scaling: str = LINEAR,
    stochastic: bool = False,
    key: Optional[jax.Array] = None,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Fake-quant with straight-through gradient: value ``q(x)``, grad ``1``.

    This one expression replaces the reference's save-FP / overwrite /
    backward / restore sequence (``cnn_models/help_fun.py`` train loop): the
    forward sees quantized weights while ``d out / d x = identity``, so
    ``jax.grad`` applies updates to the full-precision master copy.
    """
    q = fake_quant(
        x,
        bits,
        bucket_size=bucket_size,
        scaling=scaling,
        stochastic=stochastic,
        key=key,
        use_pallas=use_pallas,
    )
    return x + jax.lax.stop_gradient(q - x)
