"""Tensor-parallel packed serving: slot-DP × vocab-TP via ``shard_map``.

North-star config 5 demands the decode state sharded over a multi-host pod
slice with continuous batching. The TPU-right decomposition for this model
family (measured, see docstrings in :mod:`..kernels.topk_fused`):

- **Rows (sentence-slots × beams) shard over ``data``** — slots are
  embarrassingly parallel, so the axis that maps onto DCN between hosts
  carries no per-step collective traffic at all.
- **The generator's vocab dimension shards over ``model``** (ICI) — the
  [H, V] vocab projection is ~80% of per-step weight bytes; each device
  runs the fused dequant+matmul+top-k kernel over its V/mp slice and emits
  only its local top-k + partial logsumexp. The merge is exact:
  the global top-k of a row is a subset of the union of per-shard top-k's,
  and ``lse = logsumexp_over_shards(local_lse)``.
- LSTM cells / attention weights replicate over ``model``: at serving
  hidden sizes their per-step bytes are small, and splitting the tiny
  [rows, H] recurrent matmuls across ICI would be latency-bound — the
  collective would cost more than the compute it saves. (Training-time
  tensor parallelism DOES shard them — :mod:`..parallel.sharding` — where
  matmuls are batch-wide and fat.)

So the only per-step collective is one all-gather of [rows, k]-sized
candidate statistics over ``model`` — a few KB riding ICI.

Vocab padding: the generator is packed to an ``mp × group × 256``-aligned
width with the padded columns' bias set to −1e9 ("neg-bias masking"), so
per-shard kernels need no true-width masking and padded columns can never
win a top-k slot nor perturb the logsumexp (exp(−1e9 − max) underflows to
exactly 0 in f32).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8 top-level API; fall back for older jaxlibs
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..config import BeamConfig
from ..kernels import pack_linear
from ..kernels.packed import BUCKET, PackedLinear
from ..kernels.topk_fused import dequant_matmul_topk
from ..parallel.mesh import DATA_AXIS, MODEL_AXIS
from .beam import beam_decode, expand_to_beams
from .infer import PackedDecoder, _decode_body, pack_decoder

PyTree = Any

NEG_BIAS = -1e9


def pack_generator_sharded(
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    bits: int,
    mp: int,
    *,
    scaling: str = "linear",
    max_group: int = 16,
    store_bits=None,
) -> PackedLinear:
    """Pack the [H, V] generator padded so V splits evenly into ``mp`` shards
    whose widths are whole kernel grid groups; padded columns get −1e9 bias.
    ``store_bits=8`` keeps ``bits``-level quantization but stores one level
    per byte (see :func:`..kernels.packed.pack_linear`).
    """
    k, v = kernel.shape
    align = mp * max_group * BUCKET
    vpad = -(-v // align) * align
    wp = jnp.pad(kernel, ((0, 0), (0, vpad - v)), mode="edge")
    bp = jnp.pad(
        bias.astype(jnp.float32), (0, vpad - v), constant_values=NEG_BIAS
    )
    return pack_linear(
        wp, bits, scaling=scaling, bias=bp, max_group=max_group,
        store_bits=store_bits,
    )


def shard_decoder(dec: PackedDecoder, mesh: Mesh, gen_kernel, gen_bias) -> PackedDecoder:
    """Return ``dec`` with a vocab-sharded generator placed on the mesh and
    every other weight replicated. ``gen_kernel/gen_bias`` are the original
    dense generator params (repacking pads to shard alignment)."""
    mp = mesh.shape[MODEL_AXIS]
    gen = pack_generator_sharded(
        gen_kernel, gen_bias, dec.generator.effective_quant_bits, mp,
        store_bits=(
            dec.generator.bits
            if dec.generator.quant_bits is not None
            else None
        ),
    )
    gen = PackedLinear(
        packed=jax.device_put(
            gen.packed, NamedSharding(mesh, P(None, MODEL_AXIS))
        ),
        scale=jax.device_put(gen.scale, NamedSharding(mesh, P(MODEL_AXIS, None))),
        offset=jax.device_put(gen.offset, NamedSharding(mesh, P(MODEL_AXIS, None))),
        bits=gen.bits,
        shape=gen.shape,
        group=gen.group,
        points=gen.points,
        bias=jax.device_put(gen.bias, NamedSharding(mesh, P(MODEL_AXIS))),
        quant_bits=gen.quant_bits,
    )
    rep = NamedSharding(mesh, P())
    return PackedDecoder(
        tgt_embed=jax.device_put(dec.tgt_embed, rep),
        cells=jax.tree.map(lambda x: jax.device_put(x, rep), dec.cells),
        attn_in=None if dec.attn_in is None else jax.device_put(dec.attn_in, rep),
        attn_out=jax.tree.map(lambda x: jax.device_put(x, rep), dec.attn_out),
        generator=gen,
        hidden=dec.hidden,
        compute_dtype=dec.compute_dtype,
        use_pallas=dec.use_pallas,
        topk_slots=dec.topk_slots,
        topk_lse_shift=dec.topk_lse_shift,
        topk_fold=dec.topk_fold,
        topk_pair=dec.topk_pair,
    )


def _decoder_specs(dec: PackedDecoder) -> PackedDecoder:
    """PartitionSpec pytree matching ``dec`` (same static metadata):
    vocab-sharded generator, everything else replicated."""
    specs = jax.tree.map(lambda _: P(), dec)
    gen = jax.tree.map(lambda _: P(), dec.generator).replace(
        packed=P(None, MODEL_AXIS),
        scale=P(MODEL_AXIS, None),
        offset=P(MODEL_AXIS, None),
        bias=P(MODEL_AXIS),
    )
    return specs.replace(generator=gen)


def make_sharded_decode_step_topk(
    dec: PackedDecoder, mesh: Mesh, k: int, *, with_align: bool = False
):
    """Build ``(state, tokens, enc_keys, enc_out, enc_mask) ->
    (state, (vals, idx, lse))`` with rows over ``data`` and the generator
    over ``model``; all returned candidate indices are GLOBAL vocab ids.
    ``with_align`` appends the attention alignment ``align [rows, T_src]``
    (row-sharded, no extra collective) for coverage-penalty decoding.
    """
    mp = mesh.shape[MODEL_AXIS]
    row = P(DATA_AXIS)
    rowT = P(DATA_AXIS, None, None)

    dec_specs = _decoder_specs(dec)

    def body(d: PackedDecoder, state, tokens, enc_keys, enc_out, enc_mask):
        # local rows, replicated small weights
        new_state, attn_h, align = _decode_body(
            d, state, tokens, enc_keys, enc_out, enc_mask
        )
        gen = d.generator
        # local shard width: n_padded of the LOCAL scale rows; bias masking
        # replaces true-width masking (shape is the static GLOBAL width)
        local_npad = gen.scale.shape[0] * BUCKET
        gen_local = PackedLinear(
            packed=gen.packed,
            scale=gen.scale,
            offset=gen.offset,
            bits=gen.bits,
            shape=(gen.shape[0], local_npad),
            group=gen.group,
            points=gen.points,
            bias=gen.bias,
            quant_bits=gen.quant_bits,
        )
        vals, idx, lse = dequant_matmul_topk(
            attn_h, gen_local, k,
            compute_dtype=d.compute_dtype,
            use_pallas=d.use_pallas,
            slots=d.topk_slots,
            lse_shift=d.topk_lse_shift,
            fold=d.topk_fold,
            pair=d.topk_pair,
        )
        shard = jax.lax.axis_index(MODEL_AXIS)
        idx = idx + shard * local_npad
        # exact merge over vocab shards: union of local top-k + lse-sum
        vals_g = jax.lax.all_gather(vals, MODEL_AXIS)  # [mp, rows, k]
        idx_g = jax.lax.all_gather(idx, MODEL_AXIS)
        lse_g = jax.lax.all_gather(lse, MODEL_AXIS)  # [mp, rows, 1]
        rows = vals.shape[0]
        vals_u = jnp.transpose(vals_g, (1, 0, 2)).reshape(rows, mp * k)
        idx_u = jnp.transpose(idx_g, (1, 0, 2)).reshape(rows, mp * k)
        best_v, pos = jax.lax.top_k(vals_u, k)
        best_i = jnp.take_along_axis(idx_u, pos, axis=1)
        lse_all = jax.nn.logsumexp(lse_g[..., 0], axis=0)[:, None]  # [rows, 1]
        if with_align:
            return new_state, (best_v, best_i, lse_all), align
        return new_state, (best_v, best_i, lse_all)

    def step(state, tokens, enc_keys, enc_out, enc_mask):
        state_specs = jax.tree.map(lambda _: row, state)
        cand_specs = (P(DATA_AXIS, None),) * 3
        out_specs = (
            (state_specs, cand_specs, P(DATA_AXIS, None))
            if with_align
            else (state_specs, cand_specs)
        )
        kw = dict(
            mesh=mesh,
            in_specs=(dec_specs, state_specs, row, rowT, rowT, P(DATA_AXIS, None)),
            out_specs=out_specs,
        )
        # outputs ARE replicated over `model` (post-all-gather merge) but the
        # checker can't infer it statically; kwarg renamed across jax versions
        try:
            fn = shard_map(body, check_vma=False, **kw)
        except TypeError:  # pragma: no cover
            fn = shard_map(body, check_rep=False, **kw)
        return fn(dec, state, tokens, enc_keys, enc_out, enc_mask)

    return step


def beam_search_sharded(
    model,
    variables: PyTree,
    dec: PackedDecoder,
    src: jnp.ndarray,
    src_len: jnp.ndarray,
    cfg: BeamConfig,
    mesh: Mesh,
    *,
    return_attention: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Mesh-sharded packed beam search (offline entry point).

    ``dec`` must come from :func:`shard_decoder`. Batch × beam rows must
    divide the ``data`` axis; sentences stay whole within a shard
    (B % data == 0 guarantees each shard's rows are whole k-blocks, so beam
    reordering gathers never cross shards). ``return_attention`` appends
    per-hypothesis attention (see :func:`.beam.beam_decode`); coverage
    penalties likewise flow through ``cfg``.
    """
    b, k = src.shape[0], cfg.beam_size
    dp = mesh.shape[DATA_AXIS]
    if b % dp:
        raise ValueError(f"batch {b} must divide data axis {dp}")
    from .infer import encode_packed

    keys, enc_out, enc_mask, state = encode_packed(model, variables, dec, src, src_len)
    # enc tensors stay per-SENTENCE; _decode_body folds the beam factor into
    # attention (B % data guarantees whole sentences per shard, so the
    # per-shard rows remain whole k-blocks over the local sentences)
    state_b = expand_to_beams(state, k)
    rows = NamedSharding(mesh, P(DATA_AXIS))
    keys_b = jax.device_put(keys, NamedSharding(mesh, P(DATA_AXIS, None, None)))
    enc_out_b = jax.device_put(enc_out, NamedSharding(mesh, P(DATA_AXIS, None, None)))
    enc_mask_b = jax.device_put(enc_mask, NamedSharding(mesh, P(DATA_AXIS, None)))
    state_b = jax.tree.map(lambda t: jax.device_put(t, rows), state_b)

    with_align = cfg.coverage_penalty != 0.0 or return_attention
    sharded_step = make_sharded_decode_step_topk(
        dec, mesh, k, with_align=with_align
    )

    def decode_cand(s, tokens):
        return sharded_step(s, tokens, keys_b, enc_out_b, enc_mask_b)

    return beam_decode(
        decode_cand, state_b, b, cfg, candidates=True,
        coverage_len=enc_out.shape[1] if with_align else None,
        return_attention=return_attention,
    )
