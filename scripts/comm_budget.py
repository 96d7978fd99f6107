"""Per-step communication budget + 1→2 host scaling projection at the
flagship scale (north-star ≥85% row; VERDICT round-1 item 6).

Lowers the full-size 4-bit KD train step (teacher 2x500 → student_medium,
vocab 32k, batch --batch) over an 8-device ('data' 4 x 'model' 2) CPU mesh,
parses the compiled HLO for its collectives (parallel/comm.py), and prints:

- wire bytes per step by mesh axis ('data' = the inter-host/DCN direction,
  'model' = intra-host ICI),
- the analytic 1→2-host data-parallel efficiency at a given DCN bandwidth
  and measured TPU step time (pass the tokens/s from `bench.py --train` via
  --train-tokens-per-s to anchor it; the compute side halves at 2 hosts
  because the global batch doubles — weak scaling).

Runs on CPU (compile only, nothing executes):

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
      python scripts/comm_budget.py --train-tokens-per-s <N>
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 "
    + os.environ.get("XLA_FLAGS", "")
).strip()

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--len", type=int, default=24)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--preset", default="student_medium")
    ap.add_argument(
        "--train-tokens-per-s", type=float, default=0.0,
        help="measured 1-chip KD-step throughput (bench.py --train); "
        "0 = report bytes only",
    )
    ap.add_argument("--dcn-gbps", type=float, default=25.0,
                    help="assumed per-host DCN GB/s")
    args = ap.parse_args()

    from quantized_distillation_tpu.config import (
        DistillSpec, QuantSpec, TrainConfig,
    )
    from quantized_distillation_tpu.models import make_seq2seq
    from quantized_distillation_tpu.parallel import (
        make_mesh, place_batch, place_params_seq2seq,
    )
    from quantized_distillation_tpu.parallel.comm import (
        collective_budget, format_budget, scaling_estimate,
    )
    from quantized_distillation_tpu.train import (
        build_optimizer, create_train_state, make_train_step, nmt_task,
    )

    mesh = make_mesh(model=2)
    teacher = make_seq2seq("teacher", args.vocab, args.vocab, dropout=0.0)
    student = make_seq2seq(args.preset, args.vocab, args.vocab, dropout=0.0)
    b, l = args.batch, args.len
    rng = jax.random.PRNGKey(0)
    src = jnp.ones((b, l), jnp.int32)
    sl = jnp.full((b,), l, jnp.int32)
    tgt = jnp.ones((b, l), jnp.int32)
    sv = jax.eval_shape(student.init, rng, src, sl, tgt)
    sv = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), sv)
    tv = jax.eval_shape(teacher.init, rng, src, sl, tgt)
    tv = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), tv)

    s_params = place_params_seq2seq(sv["params"], mesh)
    t_vars = {"params": place_params_seq2seq(tv["params"], mesh)}
    task = nmt_task(student, teacher, t_vars)
    tx = build_optimizer(TrainConfig(learning_rate=1e-3, clip_norm=5.0))
    state = create_train_state(s_params, tx, quant=QuantSpec(bits=4))
    step = make_train_step(
        task, tx, quant=QuantSpec(bits=4), distill=DistillSpec()
    )
    batch = place_batch(
        {
            "src": src, "src_len": sl, "tgt_in": tgt, "tgt_out": tgt,
            "tgt_mask": jnp.ones((b, l), jnp.float32),
        },
        mesh,
    )
    rngs = jax.device_put(
        jax.random.PRNGKey(0),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
    )
    print("lowering + compiling the full-size sharded KD step ...", flush=True)
    compiled = step.lower(state, batch, rngs).compile()
    budget = collective_budget(compiled, mesh)
    print(format_budget(budget))

    out = {"wire_bytes_by_axis": budget.bytes_by_axis(wire=True)}
    if args.train_tokens_per_s > 0:
        t_step = b * l / args.train_tokens_per_s
        for overlap in (False, True):
            est = scaling_estimate(
                budget, t_step, hosts=2,
                dcn_bytes_per_s=args.dcn_gbps * 1e9, overlap=overlap,
            )
            key = "overlapped" if overlap else "serialized"
            out[key] = est
            print(
                f"1->2 hosts ({key} comm, {args.dcn_gbps:.0f} GB/s DCN): "
                f"dcn {est['dcn_bytes_per_step'] / 1e6:.2f} MB/step, "
                f"t_comm {est['t_comm_s'] * 1e3:.3f} ms vs "
                f"t_step {t_step * 1e3:.3f} ms -> "
                f"efficiency {est['efficiency']:.3f}"
            )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
