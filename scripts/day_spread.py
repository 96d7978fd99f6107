"""Diagnose the ±3% same-config day spread on the quant serving path.

Round-4 observation (BASELINE.md): same-config headline runs spread
715–755k tokens/s across one tunnel day while the FP32 reference held
±0.4%. Candidate sources: (a) per-invocation recompilation (each bench.py
process compiles its own executable — Mosaic scheduling nondeterminism
would land here), (b) tunnel/dispatch interaction, (c) genuine on-device
run-to-run variance of the compiled quant program.

This script separates them IN ONE PROCESS (one compile of each program):

  1. alternate N quant / FP measurement pairs (same two-point chained
     method as bench.py) — the WITHIN-process spread of each path;
  2. sample the tunnel RTT (a trivial scalar dispatch+readback) before
     each measurement — correlation says whether the tunnel modulates the
     estimates;
  3. print per-run estimates + spread statistics. If the within-process
     quant spread is far below ±3%, the day spread is CROSS-invocation
     (fresh compiles / tunnel epochs), pinning the source and justifying a
     median-of-N same-process claim procedure.

  python scripts/day_spread.py --pairs 5
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


def rtt_sample(n: int = 3) -> float:
    """Median seconds for a trivial dispatch + scalar readback."""
    samples = []
    for i in range(n):
        t0 = time.perf_counter()
        float(jnp.asarray(float(i)) + 1.0)
        samples.append(time.perf_counter() - t0)
    return sorted(samples)[n // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=5)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--src-len", type=int, default=24)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--preset", default="student_medium")
    ap.add_argument("--lo", type=int, default=4)
    ap.add_argument("--hi", type=int, default=36)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--gen-group", type=int, default=0)
    ap.add_argument("--gen-store-bits", type=int, default=0)
    ap.add_argument("--gen-lse-shift", type=int, default=1)
    args = ap.parse_args()
    args.quick = False
    args.no_gen_fold = False  # round-5 serving default
    args.gen_pair = 0

    import bench

    fp_loop, q_loop, src, src_len = bench.build(args)
    tokens = args.batch * args.src_len

    runs = []
    for pair in range(args.pairs):
        for name, loop in (("quant", q_loop), ("fp32", fp_loop)):
            rtt = rtt_sample()
            t = bench.time_path(
                lambda n, loop=loop: loop(src, src_len, n),
                args.lo, args.hi, args.trials,
            )
            rec = {
                "pair": pair,
                "path": name,
                "tokens_per_s": round(tokens / t, 1),
                "t_decode_ms": round(t * 1e3, 4),
                "rtt_ms": round(rtt * 1e3, 2),
            }
            runs.append(rec)
            print(json.dumps(rec), flush=True)

    for name in ("quant", "fp32"):
        vals = np.array([r["tokens_per_s"] for r in runs if r["path"] == name])
        rtts = np.array([r["rtt_ms"] for r in runs if r["path"] == name])
        spread = (vals.max() - vals.min()) / vals.mean()
        corr = (
            float(np.corrcoef(vals, rtts)[0, 1]) if len(vals) > 2 else float("nan")
        )
        print(
            json.dumps(
                {
                    "path": name,
                    "n": len(vals),
                    "median_tokens_per_s": float(np.median(vals)),
                    "mean": round(float(vals.mean()), 1),
                    "spread_frac": round(float(spread), 4),
                    "cv": round(float(vals.std() / vals.mean()), 4),
                    "rtt_corr": round(corr, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
