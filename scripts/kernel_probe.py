"""Micro-probe for the fused dequant+matmul+top-k kernel (Weak-2 iteration).

Times ONE kernel at the serving operating point (rows = batch*beam) with the
two-point chained method, so kernel-variant A/B runs cost a single compile.

  python scripts/kernel_probe.py            # fused top-k kernel
  python scripts/kernel_probe.py --plain    # plain dequant_matmul
  python scripts/kernel_probe.py --m 320

Prints microseconds per call + achieved TFLOP/s.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=640, help="rows = batch*beam")
    ap.add_argument("--k", type=int, default=256)
    ap.add_argument("--n", type=int, default=32000)
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--topk", type=int, default=5)
    ap.add_argument("--slots", type=int, default=2)
    ap.add_argument("--probe", choices=("noselect", "nodots", "nolse", "lseonly"), default=None,
                    help="kernel decomposition: 'noselect' = dequant+MXU "
                    "side only (1-op/chunk consumption), 'nodots' = the "
                    "select/lse stream over zeroed tiles (no MXU work)")
    ap.add_argument("--lse-shift", action="store_true",
                    help="fixed-shift lse instead of streaming-max rescale")
    ap.add_argument("--store8", action="store_true",
                    help="store quant levels one-per-byte (unpack-free)")
    ap.add_argument("--select-bf16", action="store_true",
                    help="bf16 top-k select stream (requires --lse-shift)")
    ap.add_argument(
        "--group", type=int, default=0,
        help="buckets/grid-step; 0 = auto from the kernel's VMEM budget",
    )
    ap.add_argument("--pair", action="store_true",
                    help="bucket-pair select (one survivor update per "
                    "bucket; fixed-shift lse)")
    ap.add_argument("--fold", action="store_true",
                    help="fold offset+bias into the MXU dot (ones-row "
                    "bias; zero per-chunk v-prep)")
    ap.add_argument("--certify", action="store_true")
    ap.add_argument("--plain", action="store_true")
    ap.add_argument(
        "--step", choices=("cells", "nogen", "beamonly"), default=None,
        help="time decode-STEP components instead of one kernel: 'cells' = "
        "_decode_body only (LSTM cells + attention), 'nogen' = "
        "_decode_body + fused top-k generator (the step minus beam "
        "bookkeeping), 'beamonly' = the beam core alone (step_beams_cand "
        "over a synthetic candidate producer — no decoder, no generator). "
        "Subtract from the headline per-step time to attribute the "
        "remainder.",
    )
    ap.add_argument("--dense", action="store_true",
                    help="dense bf16 matmul + XLA top_k/lse (no pallas)")
    ap.add_argument("--dense-mm", action="store_true",
                    help="dense bf16 matmul only (cell-shape comparison)")
    ap.add_argument("--lo", type=int, default=20)
    ap.add_argument("--hi", type=int, default=120)
    ap.add_argument("--trials", type=int, default=5)
    args = ap.parse_args()

    from quantized_distillation_tpu.kernels import (
        dequant_matmul, pack_linear, pick_generator_group,
    )
    from quantized_distillation_tpu.kernels.topk_fused import dequant_matmul_topk
    from quantized_distillation_tpu.serve.sharded import pack_generator_sharded

    if not args.group:
        args.group = pick_generator_group(args.m)

    interp = jax.devices()[0].platform == "cpu"  # CPU smoke only
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((args.k, args.n)).astype(np.float32))
    x0 = jnp.asarray(rng.standard_normal((args.m, args.k)).astype(np.float32))

    if args.step == "beamonly":
        # The beam core in isolation: step_beams_cand over a synthetic
        # candidate producer whose cost is a couple of VPU ops. Measures
        # the per-step beam bookkeeping (logp/EOS masking, top_k over
        # [B, k*kc], parent gathers incl. a decoder-state-sized pytree,
        # history dus) — the "overheads" bucket of the step decomposition.
        from quantized_distillation_tpu.serve.beam import (
            init_beam_state, step_beams_cand,
        )

        beam = 5
        batch = args.m // beam
        h = 256
        state0 = init_beam_state(
            {
                "c0": jnp.zeros((args.m, h)), "h0": jnp.zeros((args.m, h), jnp.bfloat16),
                "c1": jnp.zeros((args.m, h)), "h1": jnp.zeros((args.m, h), jnp.bfloat16),
                "feed": jnp.zeros((args.m, h), jnp.bfloat16),
            },
            batch, beam, 256,
        )
        base_v = jnp.asarray(
            np.sort(rng.standard_normal((args.m, args.topk)))[:, ::-1].copy(),
            jnp.float32,
        )
        base_i = jnp.asarray(
            rng.integers(4, args.n, (args.m, args.topk)), jnp.int32
        )

        def decode_cand(st, tokens):
            # trivially cheap, state-dependent so steps serialize
            bump = st["feed"][:, :1].astype(jnp.float32) * 1e-6
            new = dict(st, feed=st["feed"] + jnp.bfloat16(1e-6))
            return new, (base_v + bump, base_i, jnp.full((args.m, 1), 5.0))

        def chain(n):
            def cond(c):
                return c[0] < n

            def body(c):
                i, st = c
                st = step_beams_cand(
                    decode_cand, st, jax.lax.rem(i, 256), beam_size=beam
                )
                return i + 1, st

            _, st = jax.lax.while_loop(cond, body, (jnp.int32(0), state0))
            return jnp.sum(st.scores) + jnp.sum(st.sym[0].astype(jnp.float32))

        loop = jax.jit(chain)

        def run2(n):
            float(loop(n))
            samples = []
            for _ in range(args.trials):
                t0 = time.perf_counter()
                float(loop(n))
                samples.append(time.perf_counter() - t0)
            return sorted(samples)

        t_lo, t_hi = run2(args.lo * 24), run2(args.hi * 24)
        ests = sorted(
            (h_ - l) / ((args.hi - args.lo) * 24) for h_, l in zip(t_hi, t_lo)
        )
        t = max(ests[len(ests) // 2], 1e-12)
        print(
            f"step:beamonly M={args.m} vocab={args.n}: {t * 1e6:.1f} us/step"
        )
        return

    if args.step:
        from quantized_distillation_tpu.models import make_seq2seq
        from quantized_distillation_tpu.serve.infer import (
            _decode_body, encode_packed, pack_decoder,
        )
        from quantized_distillation_tpu.serve.beam import expand_to_beams

        beam = 5
        batch = args.m // beam
        model = make_seq2seq("student_medium", args.n, args.n)
        src = jnp.asarray(rng.integers(4, args.n, (batch, 24)), jnp.int32)
        src_len = jnp.full((batch,), 24, jnp.int32)
        variables = model.init(
            jax.random.PRNGKey(0), src, src_len, jnp.ones((batch, 2), jnp.int32)
        )
        dec = pack_decoder(
            variables["params"], model.cfg, args.bits,
            use_pallas=not interp, generator_group=args.group,
        )
        keys, enc_out, enc_mask, st = encode_packed(
            model, variables, dec, src, src_len
        )
        # enc tensors stay per-sentence (beams fold in the decode body)
        keys_b, enc_out_b, enc_mask_b = keys, enc_out, enc_mask
        state0 = expand_to_beams(st, beam)

        def chain(n):
            def cond(c):
                return c[0] < n

            def body(c):
                i, state, tok = c
                new_state, attn_h, _ = _decode_body(
                    dec, state, tok, keys_b, enc_out_b, enc_mask_b
                )
                if args.step == "nogen":
                    v, ix, lse = dequant_matmul_topk(
                        attn_h, dec.generator, args.topk,
                        compute_dtype=dec.compute_dtype,
                        slots=args.slots,
                        lse_shift=dec.topk_lse_shift,
                        fold=dec.topk_fold,
                        pair=dec.topk_pair,
                        interpret=interp,
                    )
                    tok = ix[:, 0]
                else:
                    tok = (tok + jnp.sum(attn_h[:, :1], axis=1).astype(jnp.int32) % 3) % args.n
                return i + 1, new_state, tok

            tok0 = jnp.zeros((args.m,), jnp.int32)
            _, state, tok = jax.lax.while_loop(
                cond, body, (jnp.int32(0), state0, tok0)
            )
            return jnp.sum(tok) + jnp.sum(jax.tree.leaves(state)[0])

        loop = jax.jit(chain)
        t = None
        def run2(n):
            float(loop(n))
            samples = []
            for _ in range(args.trials):
                t0 = time.perf_counter()
                float(loop(n))
                samples.append(time.perf_counter() - t0)
            return sorted(samples)

        t_lo, t_hi = run2(args.lo * 24), run2(args.hi * 24)
        ests = sorted(
            (h - l) / ((args.hi - args.lo) * 24) for h, l in zip(t_hi, t_lo)
        )
        t = max(ests[len(ests) // 2], 1e-12)
        print(
            f"step:{args.step} M={args.m} vocab={args.n} int{args.bits}: "
            f"{t * 1e6:.1f} us/step"
        )
        return

    if args.dense_mm:
        wb = w.astype(jnp.bfloat16)

        def body(x):
            out = jnp.dot(
                x.astype(jnp.bfloat16), wb, preferred_element_type=jnp.float32
            )
            # reduce over the FULL output: a column slice lets XLA dead-code
            # the other 31k columns of the matmul (measured "993 TFLOP/s")
            return x + 1e-12 * (jnp.sum(out, axis=1, keepdims=True) + out[:, : args.k])

    elif args.dense:
        wb = w.astype(jnp.bfloat16)

        def body(x):
            logits = jnp.dot(
                x.astype(jnp.bfloat16), wb, preferred_element_type=jnp.float32
            )
            v, i = jax.lax.top_k(logits, args.topk)
            lse = jax.nn.logsumexp(logits, axis=-1)
            return x + 1e-12 * (v.sum() + lse.sum() + i.sum())

    elif args.plain:
        p = pack_linear(w, args.bits)

        def body(x):
            out = dequant_matmul(
                x, p, compute_dtype=jnp.bfloat16, interpret=interp
            )
            # feed a [M, K]-shaped mix back so calls chain by data dependency
            return x + 1e-12 * out[:, : args.k]

    else:
        p = pack_generator_sharded(
            w, jnp.zeros((args.n,), jnp.float32), args.bits, mp=1,
            max_group=args.group, store_bits=8 if args.store8 else None,
        )

        def body(x):
            out = dequant_matmul_topk(
                x, p, args.topk, compute_dtype=jnp.bfloat16,
                slots=args.slots, pair=args.pair, fold=args.fold,
                lse_shift=args.lse_shift, probe=args.probe,
                select_dtype=jnp.bfloat16 if args.select_bf16 else jnp.float32,
                certify=args.certify,
                interpret=interp,
            )
            return x + 1e-12 * (out[0].sum() + out[2].sum())

    @jax.jit
    def chain(x, n):
        def cond(c):
            return c[0] < n

        def step(c):
            i, xx = c
            return i + 1, body(xx)

        return jax.lax.while_loop(cond, step, (jnp.int32(0), x))[1].sum()

    def run(n):
        float(chain(x0, n))
        samples = []
        for _ in range(args.trials):
            t0 = time.perf_counter()
            float(chain(x0, n))
            samples.append(time.perf_counter() - t0)
        return sorted(samples)

    t_lo, t_hi = run(args.lo), run(args.hi)
    ests = sorted(
        (h - l) / (args.hi - args.lo) for h, l in zip(t_hi, t_lo)
    )
    t = max(ests[len(ests) // 2], 1e-12)
    flops = 2.0 * args.m * args.k * args.n
    kind = (
        "dense-mm" if args.dense_mm
        else "dense+topk+lse" if args.dense
        else "plain" if args.plain
        else f"topk{args.topk}/slots{args.slots}"
        + ("/pair" if args.pair else "")
        + ("/fold" if args.fold else "")
        + (f"/probe:{args.probe}" if args.probe else "")
        + ("+lseshift" if args.lse_shift else "")
        + ("+store8" if args.store8 else "")
        + ("+selbf16" if args.select_bf16 else "")
        + ("+cert" if args.certify else "")
    )
    print(
        f"{kind} M={args.m} K={args.k} N={args.n} int{args.bits}: "
        f"{t * 1e6:.1f} us/call, {flops / t / 1e12:.1f} TFLOP/s"
    )


if __name__ == "__main__":
    main()
