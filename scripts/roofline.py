"""Per-kernel roofline verification (north-star: every dequant+matmul kernel
roofline-verified per chip).

Measures the fused dequant+matmul kernels against dense XLA baselines on
EVERY packed-kernel shape the serving path dispatches (see
serve/infer.py::_decode_body), and prints achieved FLOP/s + HBM bandwidth vs
peaks:

- generator:   [M, H]      x [H, Vpad]   (the fused top-k kernel's home)
- LSTM cell 0: [M, E+2H]   x [E+2H, 4H]  (embed+feed+h -> gates)
- LSTM cell 1: [M, 2H]     x [2H, 4H]
- attn_out:    [M, 2H]     x [2H, H]     (context|h -> attn_h)

Default dims are the WMT13 student_medium serving operating point
(M = batch 64 x beam 5, E = H = 256, V = 32000). ``--m/--k/--n`` bench one
custom generator-family shape instead.

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

BYTE_NOTE = """\
NOTE byte accounting is per-path (what actually crosses HBM), so the GB/s
column is NOT comparable across rows: dense baselines count weight bytes
only (the jnp.sum consumer fuses the [M, N] product away, flattering their
GB/s), pallas dequant rows count packed weights + their REAL [M, Npad] f32
output write, and the fused top-k row counts packed weights + [M, 128]x3
stats (no logits ever reach HBM)."""


def run_shape(title, m, k, n, trials, topk=False):
    from quantized_distillation_tpu.kernels import dequant_matmul, pack_linear
    from quantized_distillation_tpu.utils.profiling import measure, roofline

    print(f"\n== {title}: [{m}, {k}] x [{k}, {n}] ==", flush=True)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    xb = x.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)

    flops = 2.0 * m * k * n
    results = []

    def bench(name, body, bytes_moved):
        t = measure(body, trials=trials)
        r = roofline(name, t, flops, bytes_moved + 4.0 * m * k)
        results.append(r)
        print(r.line(), flush=True)

    # Dense baselines. The body threads the carry through x (no loop
    # hoisting) and reduces a NONLINEARITY of the whole output: a plain
    # jnp.sum lets XLA's algebraic simplifier factor sum(x @ w) into
    # (colsum x) @ w — O(MK + KN) instead of the matmul (observed: "83886
    # TFLOP/s" at small shapes); tanh blocks the rewrite while still fusing
    # into the matmul epilogue.
    bench(
        "dense f32",
        lambda c: jnp.sum(
            jnp.tanh(jnp.dot(x + c, w, preferred_element_type=jnp.float32))
        )
        * 1e-9,
        4.0 * k * n,
    )  # NB: default matmul precision — XLA feeds the MXU bf16
    bench(
        "dense bf16",
        lambda c: jnp.sum(
            jnp.tanh(
                jnp.dot(
                    xb + c.astype(jnp.bfloat16), wb,
                    preferred_element_type=jnp.float32,
                )
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
    if topk:
        # fused generator kernel: logits never reach HBM — out is [m, 128]x3
        from quantized_distillation_tpu.kernels.topk_fused import (
            dequant_matmul_topk,
        )
        from quantized_distillation_tpu.serve.sharded import (
            pack_generator_sharded,
        )

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
    print("speedup vs dense f32:")
    for r in results:
        print(f"  {r.name}: {base / r.seconds:.2f}x")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=0, help="custom rows (0 = suite)")
    ap.add_argument("--k", type=int, default=256, help="custom hidden")
    ap.add_argument("--n", type=int, default=32000, help="custom vocab")
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--rows", type=int, default=320, help="suite batch*beam")
    ap.add_argument("--hidden", type=int, default=256, help="suite E = H")
    ap.add_argument("--vocab", type=int, default=32000)
    args = ap.parse_args()

    print(BYTE_NOTE, flush=True)
    if args.m:
        run_shape("custom", args.m, args.k, args.n, args.trials, topk=True)
        return
    m, h, e, v = args.rows, args.hidden, args.hidden, args.vocab
    run_shape("generator", m, h, v, args.trials, topk=True)
    run_shape("lstm cell 0 (embed+feed+h -> gates)", m, e + 2 * h, 4 * h, args.trials)
    run_shape("lstm cell 1 (x+h -> gates)", m, 2 * h, 4 * h, args.trials)
    run_shape("attn_out (context|h -> attn_h)", m, 2 * h, h, args.trials)


if __name__ == "__main__":
    main()
