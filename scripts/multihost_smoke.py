"""Multi-process (DCN-path) smoke: sharded KD train + serve across hosts.

The reference has no distributed anything (SURVEY.md §2); the new framework's
multi-host story is `jax.distributed.initialize` + a ('data', 'model') mesh
whose `data` axis spans processes (DCN) and `model` axis stays intra-process
(ICI on real hardware). This script validates that path WITHOUT a pod: it
self-spawns N local processes (CPU backend, Gloo collectives, 2 fake devices
each), builds the global 2D mesh, and runs

  1. a psum sanity across all global devices,
  2. ONE full fake-quant KD train step with the production sharding rules
     (`parallel.sharding.place_params_seq2seq` / batch over `data`),
  3. FOUR chained sharded decode steps (`make_sharded_decode_step_topk`)
     with vocab-TP inside each process and beam rows spanning the
     process-crossing `data` axis — the north-star serving decomposition,
     token-parity-checked against the single-device packed step per shard,

asserting every process sees the same finite loss and identical tokens.
SURVEY.md §4 item 3; round-4 VERDICT missing #4 (the serving path had never
crossed a process boundary).

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

    # 3. sharded SERVING decode across processes: the north-star layout —
    # vocab-TP over `model` (intra-process "ICI"), slot×beam rows over the
    # process-spanning `data` axis ("DCN", which carries 0 decode bytes).
    # Four chained decode steps; each process checks its addressable row
    # shards against the single-device packed step (exact: same f32 math,
    # same padded generator columns; only the lse merge order differs and
    # it never affects per-row top-k order).
    from jax.sharding import NamedSharding as NS, PartitionSpec as PS

    from quantized_distillation_tpu.serve import pack_decoder, shard_decoder
    from quantized_distillation_tpu.serve.beam import expand_to_beams
    from quantized_distillation_tpu.serve.infer import (
        encode_packed,
        packed_decode_step_topk,
    )
    from quantized_distillation_tpu.serve.sharded import (
        make_sharded_decode_step_topk,
    )

    kbeam = 2
    dec = pack_decoder(
        sv["params"], student.cfg, 4, compute_dtype=jnp.float32,
        use_pallas=False,
    )
    sdec = shard_decoder(
        dec, mesh,
        sv["params"]["generator"]["kernel"],
        sv["params"]["generator"]["bias"],
    )
    rng_np = np.random.default_rng(7)
    src_srv = jnp.asarray(rng_np.integers(3, vocab, (b, t)), jnp.int32)
    keys, enc_out, enc_mask, st0 = encode_packed(
        student, sv, dec, src_srv, sl
    )
    state0 = expand_to_beams(st0, kbeam)
    tok0 = jnp.full((b * kbeam,), 2, jnp.int32)

    # single-device reference (every process computes the full batch)
    ref_step = jax.jit(
        lambda st, tok: packed_decode_step_topk(
            dec, st, tok, keys, enc_out, enc_mask, kbeam
        )
    )
    st_ref, tok_ref = state0, tok0
    ref_toks = []
    for _ in range(4):
        st_ref, (_, idx, _) = ref_step(st_ref, tok_ref)
        tok_ref = idx[:, 0]
        ref_toks.append(np.asarray(tok_ref))

    # sharded path: rows over `data` (spans processes), generator over
    # `model`; device_put of host-replicated values to the global sharding
    rows_sh = NS(mesh, PS("data"))
    keys_b = jax.device_put(keys, NS(mesh, PS("data", None, None)))
    enc_out_b = jax.device_put(enc_out, NS(mesh, PS("data", None, None)))
    enc_mask_b = jax.device_put(enc_mask, NS(mesh, PS("data", None)))
    st_sh = jax.tree.map(lambda x: jax.device_put(x, rows_sh), state0)
    tok_sh = jax.device_put(tok0, rows_sh)
    sstep = jax.jit(make_sharded_decode_step_topk(sdec, mesh, kbeam))
    for i in range(4):
        st_sh, (_, idx_sh, _) = sstep(
            st_sh, tok_sh, keys_b, enc_out_b, enc_mask_b
        )
        tok_sh = idx_sh[:, 0]
        # parity on this process's addressable shards only (global rows
        # live across processes)
        for shard in tok_sh.addressable_shards:
            np.testing.assert_array_equal(
                np.asarray(shard.data), ref_toks[i][shard.index]
            )
    print(
        f"[proc {pid}/{nprocs}] mesh {dict(mesh.shape)} psum OK, "
        f"KD step loss {loss:.4f} OK, sharded decode x4 token-parity OK "
        f"(rows {b * kbeam} over data, vocab-TP {DEVS_PER_PROC})",
        flush=True,
    )


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
    print(
        f"multihost smoke: {args.procs} processes x {DEVS_PER_PROC} devices "
        "OK (KD train step + sharded decode x4 token parity)"
    )


if __name__ == "__main__":
    main()
