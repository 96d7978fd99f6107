"""Headline benchmark: 4-bit WMT13-scale student serving throughput per chip.

Measures beam-search decode tokens/s of the seq2seq student (the reference's
evaluation hot loop, onmt/Translator.py, re-designed as one lax.scan) on the
local accelerator, for the quantized-weight path vs the FP32 path.
``vs_baseline`` is quantized/FP32 tokens/s — the north-star target is >= 3x
once packed-int4 Pallas dequant+matmul kernels carry the serving path.

Timing notes (tunneled-TPU environment): ``block_until_ready`` does not
truly synchronize through the relay and each dispatch pays a ~40ms
round-trip, so the benchmark (a) chains R full decodes *inside one jitted
program* with a data dependency between them, (b) forces completion with a
scalar readback, and (c) uses a two-point estimate — wall(R_hi chained
decodes) minus wall(R_lo) — so the fixed per-dispatch relay overhead cancels
exactly (a production server amortizes it the same way: the engine loops
on-device, the host only feeds slots). Throughput = B * max_len / t_decode.

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
    # quantized path: packed INT-bits weights + fused Pallas dequant+matmul.
    # generator_group: the fused kernel's VMEM logits tile is
    # rows*group*1024 bytes vs a ~16MB scoped budget (see pack_decoder).
    use_pallas = jax.devices()[0].platform != "cpu"
    rows = args.batch * args.beam
    # largest power-of-two group whose rows*group*1024-byte logits tile fits
    # a ~12MB VMEM budget (16MB scoped minus weights/scratch headroom)
    budget = 12 * 1024 * 1024
    group = 16
    while group > 1 and rows * group * 1024 > budget:
        group //= 2
    dec = pack_decoder(
        variables["params"], model.cfg, args.bits, use_pallas=use_pallas,
        generator_group=group,
    )
    cfg = BeamConfig(beam_size=args.beam, max_len=args.src_len)

    def chain(decode_fn, src0, sl, n):
        # n chained decodes; each feeds its tokens back as the next source so
        # the chain cannot be elided or overlapped away. n is a RUNTIME bound
        # (while_loop) so one compiled program serves both timing points.
        def cond(c):
            return c[0] < n

        def body(c):
            i, s, acc = c
            toks, scores = decode_fn(s, sl)
            nxt = jnp.clip(toks, 4, args.vocab - 1).astype(jnp.int32)
            return i + 1, nxt, acc + jnp.sum(scores)

        return jax.lax.while_loop(cond, body, (jnp.int32(0), src0, 0.0))[2]

    fp_loop = jax.jit(
        lambda s0, sl, n: chain(
            lambda s, l: beam_search(model, variables, s, l, cfg), s0, sl, n
        )
    )
    q_loop = jax.jit(
        lambda s0, sl, n: chain(
            lambda s, l: beam_search_packed(model, variables, dec, s, l, cfg), s0, sl, n
        )
    )
    return fp_loop, q_loop, src, src_len


def time_path(fn, lo, hi, trials):
    """Seconds per unit of chained work (``fn(n)`` runs n units inside one
    program and returns a scalar): two-point estimate so dispatch overhead
    cancels."""

    def run(n):
        float(fn(n))  # compile/warm; scalar readback syncs
        samples = []
        for _ in range(trials):
            t0 = time.perf_counter()
            acc = float(fn(n))
            samples.append(time.perf_counter() - t0)
            assert np.isfinite(acc)
        return sorted(samples)

    t_lo, t_hi = run(lo), run(hi)
    ests = [(h - l) / (hi - lo) for h, l in zip(t_hi, t_lo)]
    ests.sort()
    return max(ests[len(ests) // 2], 1e-9)


def build_train(args):
    """4-bit STE knowledge-distillation train step (teacher 2x500, student
    per --preset) on a synthetic WMT-shaped batch; n chained steps run
    inside ONE jitted while_loop (the state dependency serializes them)."""
    from quantized_distillation_tpu.config import (
        DistillSpec, QuantSpec, TrainConfig,
    )
    from quantized_distillation_tpu.models import make_seq2seq
    from quantized_distillation_tpu.train import (
        build_optimizer, create_train_state, make_train_step, nmt_task,
    )

    teacher = make_seq2seq("teacher", args.vocab, args.vocab, dropout=0.0)
    student = make_seq2seq(args.preset, args.vocab, args.vocab, dropout=0.0)
    rng = jax.random.PRNGKey(0)
    b, l = args.batch, args.src_len
    batch = {
        "src": jax.random.randint(rng, (b, l), 4, args.vocab),
        "src_len": jnp.full((b,), l, jnp.int32),
        "tgt_in": jax.random.randint(rng, (b, l), 4, args.vocab),
        "tgt_out": jax.random.randint(rng, (b, l), 4, args.vocab),
        "tgt_mask": jnp.ones((b, l), jnp.float32),
    }
    tv = teacher.init(rng, batch["src"], batch["src_len"], batch["tgt_in"])
    sv = student.init(rng, batch["src"], batch["src_len"], batch["tgt_in"])
    task = nmt_task(student, teacher, tv)
    tx = build_optimizer(TrainConfig(learning_rate=1e-3, clip_norm=5.0))

    def make_loop(quant):
        step = make_train_step(
            task, tx, quant=quant, distill=DistillSpec(), donate=False
        )
        state0 = create_train_state(sv["params"], tx)

        def chain(state, rng_, n):
            def cond(c):
                return c[0] < n

            def body(c):
                i, st, acc = c
                st, m = step(st, batch, rng_)
                return i + 1, st, acc + m["loss"]

            return jax.lax.while_loop(
                cond, body, (jnp.int32(0), state, 0.0)
            )[2]

        loop = jax.jit(chain)
        return lambda n: loop(state0, jax.random.PRNGKey(1), n)

    return make_loop(QuantSpec(bits=args.bits)), make_loop(None)


def run_train(args):
    q_loop, fp_loop = build_train(args)
    t_q = time_path(q_loop, args.lo, args.hi, args.trials)
    t_fp = time_path(fp_loop, args.lo, args.hi, args.trials)
    tokens = args.batch * args.src_len
    print(
        json.dumps(
            {
                "metric": "wmt13_kd_4bit_ste_train_tokens_per_s_per_chip",
                "value": round(tokens / t_q, 1),
                "unit": "tokens/s",
                "vs_baseline": round(t_fp / t_q, 3),
            }
        )
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="student_medium")
    p.add_argument("--vocab", type=int, default=32000)
    # 128 slots: measured the best tokens/s/chip operating point on v5e
    # (B=64 underfills the MXU at M=320; B=256 needs generator_group=8 and
    # measured slightly below B=128).
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--src-len", type=int, default=24)
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--bits", type=int, default=4)
    p.add_argument("--trials", type=int, default=5)
    # long chains: the tunnel's per-dispatch RTT jitter is tens of ms, so the
    # hi-lo work delta must be >> that for a stable estimate
    p.add_argument("--lo", type=int, default=4, help="short-chain decode count")
    p.add_argument("--hi", type=int, default=36, help="long-chain decode count")
    p.add_argument("--quick", action="store_true", help="tiny shapes for CPU smoke")
    p.add_argument(
        "--train", action="store_true",
        help="bench the 4-bit STE KD train step instead of serving decode",
    )
    args = p.parse_args()
    if args.quick:
        args.vocab, args.batch, args.src_len = 512, 8, 8
        args.trials, args.lo, args.hi = 2, 1, 3
    if args.train:
        if not args.quick:
            # train steps are ~100x a decode step; shorter chains suffice
            args.lo, args.hi = 2, 8
        run_train(args)
        return

    fp_loop, q_loop, src, src_len = build(args)
    t_fp = time_path(lambda n: fp_loop(src, src_len, n), args.lo, args.hi, args.trials)
    t_q = time_path(lambda n: q_loop(src, src_len, n), args.lo, args.hi, args.trials)
    tokens = args.batch * args.src_len
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
