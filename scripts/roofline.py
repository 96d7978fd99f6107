"""Per-kernel roofline verification (north-star: every dequant+matmul kernel
roofline-verified per chip).

Measures the fused dequant+matmul kernels against dense XLA baselines on the
serving shapes (generator matmul of the WMT13 student: M = batch*beam,
K = hidden, N = vocab) and prints achieved FLOP/s + HBM bandwidth vs peaks.

Run on TPU: python scripts/roofline.py
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=320, help="batch*beam rows")
    ap.add_argument("--k", type=int, default=256, help="hidden (reduction)")
    ap.add_argument("--n", type=int, default=32000, help="vocab (output)")
    ap.add_argument("--trials", type=int, default=5)
    args = ap.parse_args()

    from quantized_distillation_tpu.kernels import dequant_matmul, pack_linear
    from quantized_distillation_tpu.utils.profiling import measure, roofline

    m, k, n = args.m, args.k, args.n
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    xb = x.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)

    flops = 2.0 * m * k * n

    results = []

    # Byte accounting is per-path (what actually crosses HBM):
    # - dense baselines: weight bytes only — the jnp.sum consumer fuses, the
    #   [m, n] product never reaches HBM, and XLA hoists loop-invariant
    #   weight conversion, so the f32 label reflects default-precision
    #   (bf16-converted) practice;
    # - plain pallas dequant_matmul: packed weight bytes + the full [m, npad]
    #   f32 OUTPUT write (it is a real kernel output — measured to dominate
    #   at vocab widths; this is exactly what the fused top-k kernel removes);
    # - fused top-k: packed weight bytes + [m, 128]x3 stats only.
    def bench(name, body, bytes_moved):
        t = measure(body, trials=args.trials)
        r = roofline(name, t, flops, bytes_moved + 4.0 * m * k)
        results.append(r)
        print(r.line(), flush=True)

    # Dense baselines. The body threads the carry through x (no loop
    # hoisting) and SUMS the whole output (reading one element lets XLA DCE
    # the matmul down to a dot product — observed: "2100 TFLOP/s").
    bench(
        "dense f32",
        lambda c: jnp.sum(jnp.dot(x + c, w, preferred_element_type=jnp.float32))
        * 1e-9,
        4.0 * k * n,
    )  # NB: default matmul precision — XLA feeds the MXU bf16
    bench(
        "dense bf16",
        lambda c: jnp.sum(
            jnp.dot(
                xb + c.astype(jnp.bfloat16), wb, preferred_element_type=jnp.float32
            )
        )
        * 1e-9,
        2.0 * k * n,
    )
    for bits in (8, 4, 2):
        p = pack_linear(w, bits)
        bench(
            f"pallas int{bits}",
            lambda c, p=p: jnp.sum(
                dequant_matmul(x + c, p, compute_dtype=jnp.bfloat16)
            )
            * 1e-9,
            k * n * bits / 8.0 + 4.0 * m * p.n_padded,  # + real output write
        )
    pts = jnp.linspace(0.0, 1.0, 16)
    pc = pack_linear(w, 4, points=pts)
    bench(
        "pallas cb4",
        lambda c: jnp.sum(dequant_matmul(x + c, pc, compute_dtype=jnp.bfloat16))
        * 1e-9,
        k * n / 2.0 + 4.0 * m * pc.n_padded,
    )
    # fused generator kernel: logits never reach HBM — output is [m, k_top]x3
    from quantized_distillation_tpu.kernels.topk_fused import dequant_matmul_topk
    from quantized_distillation_tpu.serve.sharded import pack_generator_sharded

    pt = pack_generator_sharded(
        w, jnp.zeros((n,), jnp.float32), 4, mp=1, max_group=16
    )
    bench(
        "pallas int4+topk5+lse",
        lambda c: (
            lambda o: (jnp.sum(o[0]) + jnp.sum(o[2])) * 1e-9
        )(dequant_matmul_topk(x + c, pt, 5, compute_dtype=jnp.bfloat16)),
        k * n / 2.0 + 12.0 * m * 128,
    )

    base = results[0].seconds
    print("\nspeedup vs dense f32:")
    for r in results:
        print(f"  {r.name}: {base / r.seconds:.2f}x")


if __name__ == "__main__":
    main()
