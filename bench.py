"""Headline benchmark: 4-bit WMT13-scale student serving throughput per chip.

Measures beam-search decode tokens/s of the seq2seq student (the reference's
evaluation hot loop, onmt/Translator.py, re-designed as one lax.scan) on the
local accelerator, for the quantized-weight path vs the FP32 path.
``vs_baseline`` is quantized/FP32 tokens/s — the north-star target is >= 3x
once packed-int4 Pallas dequant+matmul kernels carry the serving path.

Timing notes (tunneled-TPU environment): ``block_until_ready`` does not
truly synchronize through the relay and each dispatch pays ~40ms round-trip,
so the benchmark (a) chains R full decodes *inside one jitted program* with a
data dependency between them, and (b) forces completion with a scalar
readback. Throughput = B * max_len * R * iters / wall.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def build(args):
    from quantized_distillation_tpu.config import BeamConfig
    from quantized_distillation_tpu.models import make_seq2seq
    from quantized_distillation_tpu.serve import beam_search
    from quantized_distillation_tpu.serve.infer import beam_search_packed, pack_decoder

    model = make_seq2seq(args.preset, args.vocab, args.vocab)
    rng = jax.random.PRNGKey(0)
    src = jax.random.randint(rng, (args.batch, args.src_len), 4, args.vocab)
    src_len = jnp.full((args.batch,), args.src_len, jnp.int32)
    tgt_probe = jnp.ones((args.batch, 2), jnp.int32)
    variables = model.init(rng, src, src_len, tgt_probe)
    # quantized path: packed INT-bits weights + fused Pallas dequant+matmul
    use_pallas = jax.devices()[0].platform != "cpu"
    dec = pack_decoder(
        variables["params"], model.cfg, args.bits, use_pallas=use_pallas
    )
    cfg = BeamConfig(beam_size=args.beam, max_len=args.src_len)

    def chain(decode_fn, src0, sl):
        # R chained decodes; each feeds its tokens back as the next source so
        # the chain cannot be elided or overlapped away.
        def body(s, _):
            toks, scores = decode_fn(s, sl)
            nxt = jnp.clip(toks, 4, args.vocab - 1).astype(jnp.int32)
            return nxt, jnp.sum(scores)

        _, sums = jax.lax.scan(body, src0, None, length=args.inner)
        return jnp.sum(sums)

    fp_loop = jax.jit(
        lambda s0, sl: chain(lambda s, l: beam_search(model, variables, s, l, cfg), s0, sl)
    )
    q_loop = jax.jit(
        lambda s0, sl: chain(
            lambda s, l: beam_search_packed(model, variables, dec, s, l, cfg), s0, sl
        )
    )
    return fp_loop, q_loop, src, src_len


def time_path(fn, src, src_len, iters, warmup=1):
    for _ in range(warmup):
        float(fn(src, src_len))  # scalar readback forces completion
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(iters):
        acc += float(fn(src, src_len))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(acc)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="student_medium")
    p.add_argument("--vocab", type=int, default=32000)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--src-len", type=int, default=24)
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--bits", type=int, default=4)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--inner", type=int, default=4, help="decodes chained per dispatch")
    p.add_argument("--quick", action="store_true", help="tiny shapes for CPU smoke")
    args = p.parse_args()
    if args.quick:
        args.vocab, args.batch, args.src_len = 512, 8, 8
        args.iters, args.inner = 2, 2

    fp_loop, q_loop, src, src_len = build(args)
    t_fp = time_path(fp_loop, src, src_len, args.iters)
    t_q = time_path(q_loop, src, src_len, args.iters)
    tokens = args.batch * args.src_len * args.inner
    tok_s_q = tokens / t_q
    tok_s_fp = tokens / t_fp
    print(
        json.dumps(
            {
                "metric": "wmt13_student_4bit_beam_decode_tokens_per_s_per_chip",
                "value": round(tok_s_q, 1),
                "unit": "tokens/s",
                "vs_baseline": round(tok_s_q / tok_s_fp, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
