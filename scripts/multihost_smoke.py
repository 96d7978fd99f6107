"""Multi-process (DCN-path) smoke: one sharded KD train step across hosts.

The reference has no distributed anything (SURVEY.md §2); the new framework's
multi-host story is `jax.distributed.initialize` + a ('data', 'model') mesh
whose `data` axis spans processes (DCN) and `model` axis stays intra-process
(ICI on real hardware). This script validates that path WITHOUT a pod: it
self-spawns N local processes (CPU backend, Gloo collectives, 2 fake devices
each), builds the global 2D mesh, and runs

  1. a psum sanity across all global devices,
  2. ONE full fake-quant KD train step with the production sharding rules
     (`parallel.sharding.place_params_seq2seq` / batch over `data`),

asserting every process sees the same finite loss. SURVEY.md §4 item 3.

  python scripts/multihost_smoke.py            # spawn 2 processes
  python scripts/multihost_smoke.py --procs 4
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DEVS_PER_PROC = 2


def worker(pid: int, nprocs: int, port: int) -> None:
    import jax

    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nprocs, process_id=pid
    )
    import jax.numpy as jnp
    import numpy as np

    from quantized_distillation_tpu.config import DistillSpec, QuantSpec, TrainConfig
    from quantized_distillation_tpu.models import make_seq2seq
    from quantized_distillation_tpu.parallel import make_mesh
    from quantized_distillation_tpu.parallel.sharding import (
        place_batch,
        place_params_seq2seq,
    )
    from quantized_distillation_tpu.train import (
        build_optimizer,
        create_train_state,
        make_train_step,
        nmt_task,
    )

    n_global = len(jax.devices())
    assert n_global == nprocs * DEVS_PER_PROC, (n_global, nprocs)
    # data axis spans processes (the DCN direction); model stays intra-process
    mesh = make_mesh(data=nprocs, model=DEVS_PER_PROC)

    # 1. psum sanity across the whole mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    x = jnp.arange(n_global * 4, dtype=jnp.float32).reshape(n_global, 4)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    total = float(jax.jit(
        lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P())
    )(xs))
    expect = float(np.sum(np.arange(n_global * 4)))
    assert total == expect, (total, expect)

    # 2. one sharded fake-quant KD train step (tiny shapes)
    vocab, hidden, b, t = 64, 32, 2 * nprocs, 6
    student = make_seq2seq("student_small", vocab, vocab, hidden=hidden, embed_dim=32)
    teacher = make_seq2seq("student_small", vocab, vocab, hidden=2 * hidden, embed_dim=32)
    src = jnp.ones((b, t), jnp.int32)
    sl = jnp.full((b,), t, jnp.int32)
    tgt = jnp.ones((b, t), jnp.int32)
    sv = student.init(jax.random.PRNGKey(0), src, sl, tgt)
    tv = teacher.init(jax.random.PRNGKey(1), src, sl, tgt)
    s_params = place_params_seq2seq(sv["params"], mesh)
    t_vars = {"params": place_params_seq2seq(tv["params"], mesh)}
    task = nmt_task(student, teacher, t_vars)
    tx = build_optimizer(TrainConfig(learning_rate=1e-3, clip_norm=5.0))
    state = create_train_state(s_params, tx, quant=QuantSpec(bits=4))
    step = make_train_step(task, tx, quant=QuantSpec(bits=4), distill=DistillSpec())
    batch = place_batch(
        {
            "src": src, "src_len": sl, "tgt_in": tgt, "tgt_out": tgt,
            "tgt_mask": jnp.ones((b, t), jnp.float32),
        },
        mesh,
    )
    rng = jax.device_put(
        jax.random.PRNGKey(0), NamedSharding(mesh, P())
    )
    state, metrics = step(state, batch, rng)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), loss
    print(f"[proc {pid}/{nprocs}] mesh {dict(mesh.shape)} psum OK, "
          f"KD step loss {loss:.4f} OK", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--port", type=int, default=0, help="0 = pick a free port")
    ap.add_argument("--worker", type=int, default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args.worker is not None:
        worker(args.worker, args.procs, args.port)
        return
    if not args.port:
        import socket

        with socket.socket() as s:
            s.bind(("localhost", 0))
            args.port = s.getsockname()[1]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEVS_PER_PROC} "
        + env.get("XLA_FLAGS", "")
    ).strip()
    # the tunneled-TPU site hook must not capture the workers
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
           if p and ".axon_site" not in p]
    )
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--procs", str(args.procs), "--port", str(args.port),
             "--worker", str(i)],
            env=env,
        )
        for i in range(args.procs)
    ]
    rc = [p.wait() for p in procs]
    if any(rc):
        sys.exit(f"worker failures: {rc}")
    print(f"multihost smoke: {args.procs} processes x {DEVS_PER_PROC} devices OK")


if __name__ == "__main__":
    main()
