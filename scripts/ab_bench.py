"""Interleaved same-process A/B for kernel and decode-step variants.

Round-5 lesson: sequential kernel_probe.py invocations drift ±15% across
one tunnel day (84-105 us for the SAME config), far above the effects
being measured — so every variant must be timed in ONE process with the
measurements INTERLEAVED round-robin, letting each config's median ride
the same drift. This harness builds every requested variant up front (one
compile each), then alternates two-point measurements across R rounds.

  python scripts/ab_bench.py --level kernel --configs base,fold,pair,fold+pair
  python scripts/ab_bench.py --level step   --configs base,fold+pair --rounds 3

Config tokens (combine with '+'): fold, pair, lseshift, store8, slots1,
group16, base (empty). Step level also accepts fp (the FP32 flax path),
cb (codebook requant8 deploy), and the PERF-PROBE tokens nogather /
notopk / nobook / noembed which skip a named beam-tail component (results
are wrong; the delta vs the un-probed config attributes that component's
cost — used for the round-5 tail decomposition).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


PROBE_TOKENS = ("nogather", "notopk", "nobook", "noembed")


def parse_cfg(tok: str) -> dict:
    d = dict(fold=False, pair=False, lse_shift=False, store8=False,
             slots=2, group=0, fp=False, cb=False, probe=set(),
             tuplestate=False, kcomb=False)
    for part in tok.split("+"):
        if part in ("base", ""):
            continue
        elif part == "tuplestate":
            d["tuplestate"] = True  # pre-round-5 nested-tuple state layout
        elif part == "kcomb":
            d["kcomb"] = True  # fused pallas beam-combine kernel
        elif part in PROBE_TOKENS:
            # perf probes (step level only): skip a named tail component so
            # its cost shows up as the delta vs the same config without it.
            # RESULTS ARE WRONG under a probe — timing attribution only.
            d["probe"].add(part)
        elif part == "fold":
            d["fold"] = True
        elif part == "pair":
            d["pair"] = True
        elif part == "lseshift":
            d["lse_shift"] = True
        elif part == "store8":
            d["store8"] = True
        elif part == "slots1":
            d["slots"] = 1
        elif part.startswith("group"):
            d["group"] = int(part[5:])
        elif part == "fp":
            d["fp"] = True
        elif part == "cb":
            d["cb"] = True  # codebook (diffquant) deploy via requant8
        else:
            raise SystemExit(f"unknown config token {part!r}")
    return d


def two_point(fn, lo, hi, trials):
    def run(n):
        float(fn(n))
        samples = []
        for _ in range(trials):
            t0 = time.perf_counter()
            float(fn(n))
            samples.append(time.perf_counter() - t0)
        return sorted(samples)

    t_lo, t_hi = run(lo), run(hi)
    ests = sorted((h - l) / (hi - lo) for h, l in zip(t_hi, t_lo))
    return max(ests[len(ests) // 2], 1e-12)


def build_kernel(names, args, interp):
    from quantized_distillation_tpu.kernels import pick_generator_group
    from quantized_distillation_tpu.kernels.topk_fused import dequant_matmul_topk
    from quantized_distillation_tpu.serve.sharded import pack_generator_sharded

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((args.k, args.n)).astype(np.float32))
    x0 = jnp.asarray(rng.standard_normal((args.m, args.k)).astype(np.float32))
    auto_group = pick_generator_group(args.m)
    loops = {}
    for name in names:
        c = parse_cfg(name)
        p = pack_generator_sharded(
            w, jnp.zeros((args.n,), jnp.float32), args.bits, mp=1,
            max_group=c["group"] or auto_group,
            store_bits=8 if c["store8"] else None,
        )

        def body(x, c=c, p=p):
            out = dequant_matmul_topk(
                x, p, args.topk, compute_dtype=jnp.bfloat16,
                slots=c["slots"], pair=c["pair"], fold=c["fold"],
                lse_shift=c["lse_shift"], interpret=interp,
            )
            return x + 1e-12 * (out[0].sum() + out[2].sum())

        @jax.jit
        def chain(x, nn, body=body):
            def cond(cc):
                return cc[0] < nn

            def step(cc):
                i, xx = cc
                return i + 1, body(xx)

            return jax.lax.while_loop(cond, step, (jnp.int32(0), x))[1].sum()

        loops[name] = lambda n, chain=chain: chain(x0, n)
    unit = 1
    return loops, unit


def build_step(names, args, interp):
    from quantized_distillation_tpu.config import BeamConfig
    from quantized_distillation_tpu.kernels import pick_generator_group
    from quantized_distillation_tpu.models import make_seq2seq
    from quantized_distillation_tpu.serve import beam_search
    from quantized_distillation_tpu.serve.infer import (
        beam_search_packed, pack_decoder,
    )

    model = make_seq2seq(args.preset, args.n, args.n)
    rng = jax.random.PRNGKey(0)
    batch = args.m // args.topk
    src = jax.random.randint(rng, (batch, args.src_len), 4, args.n)
    src_len = jnp.full((batch,), args.src_len, jnp.int32)
    variables = model.init(
        rng, src, src_len, jnp.ones((batch, 2), jnp.int32)
    )
    cfg = BeamConfig(beam_size=args.topk, max_len=args.src_len)
    auto_group = pick_generator_group(args.m)

    loops = {}
    for name in names:
        c = parse_cfg(name)
        if c["fp"]:
            def decode(s, l):
                return beam_search(model, variables, s, l, cfg)
        else:
            points = (
                jnp.linspace(0.0, 1.0, 1 << args.bits)
                if c["cb"] else None
            )
            dec = pack_decoder(
                variables["params"], model.cfg, args.bits,
                use_pallas=not interp,
                points=points,
                generator_group=c["group"] or auto_group,
                generator_store_bits=8 if c["store8"] else None,
                topk_lse_shift=c["lse_shift"],
                topk_fold=c["fold"], topk_pair=c["pair"],
                topk_slots=c["slots"],
            )

            def decode(s, l, dec=dec, c=c):
                return beam_search_packed(
                    model, variables, dec, s, l, cfg,
                    probe=frozenset(c["probe"]),
                    fused_state=not c["tuplestate"],
                    combine="pallas" if c["kcomb"] else "xla",
                )

        @jax.jit
        def loop(s0, sl, nn, decode=decode):
            def cond(cc):
                return cc[0] < nn

            def body(cc):
                i, s, acc = cc
                toks, scores = decode(s, sl)
                nxt = jnp.clip(toks, 4, args.n - 1).astype(jnp.int32)
                return i + 1, nxt, acc + jnp.sum(scores)

            return jax.lax.while_loop(cond, body, (jnp.int32(0), s0, 0.0))[2]

        loops[name] = lambda nn, loop=loop: loop(src, src_len, nn)
    unit = batch * args.src_len  # tokens per decode
    return loops, unit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--level", choices=("kernel", "step"), default="kernel")
    ap.add_argument("--configs", default="base,fold,pair,fold+pair")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--m", type=int, default=640)
    ap.add_argument("--k", type=int, default=256)
    ap.add_argument("--n", type=int, default=32000)
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--topk", type=int, default=5)
    ap.add_argument("--preset", default="student_medium")
    ap.add_argument("--src-len", type=int, default=24)
    ap.add_argument("--lo", type=int, default=0)
    ap.add_argument("--hi", type=int, default=0)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--require-tpu", action="store_true")
    args = ap.parse_args()
    if not args.lo:
        args.lo, args.hi = (20, 120) if args.level == "kernel" else (4, 36)

    dev = jax.devices()[0]
    interp = dev.platform == "cpu"
    print(json.dumps({"device": str(dev), "platform": dev.platform}), flush=True)
    if args.require_tpu and interp:
        raise SystemExit(
            "--require-tpu: jax picked the CPU backend (tunnel down or env "
            "stripped) — refusing to record meaningless interpret-mode times"
        )
    names = [s.strip() for s in args.configs.split(",")]
    if args.level == "kernel":
        loops, unit = build_kernel(names, args, interp)
    else:
        loops, unit = build_step(names, args, interp)

    # warm/compile everything first so measurement rounds see no compiles;
    # a config that fails to compile (e.g. Mosaic VMEM OOM at an operating-
    # point probe) is dropped and reported, not fatal
    ok_names = []
    for name in names:
        try:
            float(loops[name](args.lo))
            ok_names.append(name)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({
                "config": name,
                "compile_error": str(e).splitlines()[0][:200],
            }), flush=True)
    names = ok_names
    results = {n: [] for n in names}
    for r in range(args.rounds):
        for name in names:
            t = two_point(loops[name], args.lo, args.hi, args.trials)
            results[name].append(t)
            print(
                json.dumps(
                    {"round": r, "config": name, "us": round(t * 1e6, 2)}
                ),
                flush=True,
            )
    print("--- medians (interleaved, same process) ---")
    for name in names:
        ts = sorted(results[name])
        med = ts[len(ts) // 2]
        spread = (max(ts) - min(ts)) / med if med else 0.0
        rec = {
            "config": name,
            "median_us": round(med * 1e6, 2),
            "spread_frac": round(spread, 3),
        }
        if args.level == "step" and unit > 1:
            rec["tokens_per_s"] = round(unit / med, 1)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
