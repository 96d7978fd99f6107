"""Reproduce the paper's qualitative accuracy contract on synthetic data
(VERDICT round-1 item 3; SURVEY §6 rows 1-3).

The paper's contract (arXiv:1802.05668, recalled [M] — exact numbers pend
real data, see BASELINE.md gates):

1. 4-bit quantized distillation ~= the FP-distilled student (CIFAR + NMT),
2. 2-bit degrades the SMALLEST students badly,
3. widening the student recovers the 2-bit loss.

This driver runs the bits x student-width grid on the synthetic/toy tasks
that exist today and checks those orderings hold in the rebuild:

- CNN on labeled synthetic CIFAR-100 (100 classes, few samples per class —
  synthetic CIFAR-10 is too separable to show quantization damage):
  students {narrow, wide} x bits {2, 4, 8, fp32};
- LSTM seq2seq on the toy reversal corpus: students {narrow, wide} x
  bits {2, 4, fp32}, scored by BLEU.

Run (CPU, ~20-40 min):  JAX_PLATFORMS=cpu python scripts/accuracy_grid.py
Prints a table per task + one JSON line; paste results into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def vision_cell(make_fn, teacher_pack, student_preset, bits, args, label):
    """Distill one vision student at the given bit width → hard-quant acc."""
    from quantized_distillation_tpu.config import (
        DistillSpec, QuantSpec, TrainConfig,
    )
    from quantized_distillation_tpu.data import batches
    from quantized_distillation_tpu.train import (
        build_optimizer, create_train_state, make_eval_step, vision_task,
    )
    from quantized_distillation_tpu.train.loops import evaluate, fit

    teacher, teacher_vars, train_ds, test_ds = teacher_pack
    quant = QuantSpec(bits=bits) if bits else None
    # quantized students need the longer decaying schedule (the paper
    # trains quantized students well past the FP schedule)
    scfg = TrainConfig(
        epochs=args.epochs, learning_rate=args.lr, batch_size=args.batch,
        seed=args.seed, quant=quant, lr_schedule="cosine",
        distill=DistillSpec(weight=0.7, temperature=5.0),
    )
    student = make_fn(student_preset, num_classes=train_ds.num_classes)
    sv = student.init(jax.random.PRNGKey(args.seed + 1), jnp.zeros((1, 32, 32, 3)))
    task = vision_task(student, teacher, teacher_vars)
    steps_per_epoch = max(len(train_ds.labels) // args.batch, 1)
    tx = build_optimizer(scfg, steps_per_epoch)
    state = create_train_state(
        sv["params"], tx, batch_stats=sv["batch_stats"], quant=quant
    )
    state = fit(
        task, state, scfg,
        lambda epoch: batches(train_ds, args.batch, train_augment=True,
                              seed=args.seed + epoch),
        tx=tx,
    )
    ev = make_eval_step(task, quant=quant)
    return evaluate(
        ev, state, batches(test_ds, args.batch, shuffle=False,
                           drop_remainder=False)
    )["accuracy"]


def run_vision_grid(args, make_fn, teacher_preset, student_presets, label,
                    bit_list=(None, 8, 4, 2), n_data=None):
    """Bits × student-width grid for one vision family (CNN or WRN).

    Family differences are just the model factory and presets: the CNN grid
    uses the reference's full ``teacher`` preset (round-2 VERDICT weak #5 —
    was a ``student_large`` stand-in); the WRN grid is gate G3's qualitative
    demonstration (teacher WRN-28-10, students 16-2 vs 16-4) and is meant to
    run on the TPU (WRN-28-10 fwd/bwd is impractical on CPU).
    """
    from quantized_distillation_tpu.config import TrainConfig
    from quantized_distillation_tpu.data import batches, load_cifar
    from quantized_distillation_tpu.train import (
        build_optimizer, create_train_state, make_eval_step, vision_task,
    )
    from quantized_distillation_tpu.train.loops import evaluate, fit

    n_data = n_data or args.cnn_data
    train_ds = load_cifar(100, True, "/nonexistent", n_data, args.seed)
    test_ds = load_cifar(100, False, "/nonexistent", n_data // 4, args.seed)
    teacher = make_fn(teacher_preset, num_classes=100)
    tv = teacher.init(jax.random.PRNGKey(args.seed), jnp.zeros((1, 32, 32, 3)))
    tcfg = TrainConfig(epochs=args.teacher_epochs, learning_rate=args.lr,
                       batch_size=args.batch, seed=args.seed)
    ttask = vision_task(teacher)
    ttx = build_optimizer(tcfg)
    tstate = fit(
        ttask,
        create_train_state(tv["params"], ttx, batch_stats=tv["batch_stats"]),
        tcfg,
        lambda epoch: batches(train_ds, args.batch, train_augment=True,
                              seed=args.seed + epoch),
        tx=ttx,
    )
    teacher_vars = {"params": tstate.params, "batch_stats": tstate.batch_stats}
    tacc = evaluate(
        make_eval_step(ttask), tstate,
        batches(test_ds, args.batch, shuffle=False, drop_remainder=False),
    )["accuracy"]
    print(f"[{label}] teacher ({teacher_preset} preset) acc {tacc:.3f}",
          flush=True)

    pack = (teacher, teacher_vars, train_ds, test_ds)
    grid = {}
    for preset in student_presets:
        for bits in bit_list:
            acc = vision_cell(make_fn, pack, preset, bits, args, label)
            grid[f"{preset}@{bits or 'fp32'}"] = round(float(acc), 4)
            print(f"[{label}] {preset} bits={bits or 'fp32'}: acc {acc:.3f}",
                  flush=True)
    return {"teacher_acc": round(float(tacc), 4), "cells": grid}


def run_cnn_grid(args):
    from quantized_distillation_tpu.models import make_cnn

    return run_vision_grid(
        args, make_cnn, args.cnn_teacher,
        ("student_small", "student_medium"), "cnn",
    )


def run_wrn_grid(args):
    from quantized_distillation_tpu.models import make_wrn

    return run_vision_grid(
        args, make_wrn, "teacher",  # WRN-28-10 (gate G3)
        ("student_small", "student_medium"),  # 16-2 (narrow) vs 16-4 (wider)
        "wrn", bit_list=(None, 4, 2), n_data=args.wrn_data,
    )


def run_nmt_grid(args):
    from quantized_distillation_tpu.config import (
        BeamConfig, DistillSpec, QuantSpec, TrainConfig,
    )
    from quantized_distillation_tpu.data import nmt_batches, toy_corpus
    from quantized_distillation_tpu.models import make_seq2seq
    from quantized_distillation_tpu.serve import beam_search, tokens_to_sentences
    from quantized_distillation_tpu.train import (
        build_optimizer, create_train_state, make_train_step, nmt_task,
    )
    from quantized_distillation_tpu.utils.bleu import corpus_bleu

    corpus = toy_corpus(n=args.nmt_data, vocab_size=200, min_len=5, max_len=9,
                        seed=args.seed)
    test = toy_corpus(n=256, vocab_size=200, min_len=5, max_len=9,
                      seed=args.seed + 999)

    def train_model(model, teacher=None, tvars=None, bits=None):
        quant = QuantSpec(bits=bits) if bits else None
        task = nmt_task(model, teacher, tvars)
        tx = build_optimizer(
            TrainConfig(learning_rate=3e-3, clip_norm=5.0)
        )
        b0 = next(nmt_batches(corpus, args.batch))
        v = model.init(
            jax.random.PRNGKey(args.seed), jnp.asarray(b0["src"]),
            jnp.asarray(b0["src_len"]), jnp.asarray(b0["tgt_in"]),
        )
        state = create_train_state(v["params"], tx, quant=quant)
        step = make_train_step(
            task, tx, quant=quant,
            distill=DistillSpec(weight=0.7, temperature=5.0) if teacher else None,
            donate=False,
        )
        rng = jax.random.PRNGKey(1)
        for epoch in range(args.nmt_epochs):
            for batch in nmt_batches(corpus, args.batch, seed=epoch,
                                     drop_remainder=True):
                batch.pop("index")
                state, m = step(
                    state, {k: jnp.asarray(x) for k, x in batch.items()}, rng
                )
        return state, v

    def bleu_of(model, params, bits):
        # deploy path: HARD-quantized weights, beam decode, corpus BLEU
        from quantized_distillation_tpu.train import quantize_tree as qt
        from quantized_distillation_tpu.config import QuantSpec

        p = params
        if bits:
            p = qt.quantize_tree_hard(params, QuantSpec(bits=bits))
        tb = next(nmt_batches(test, 256, shuffle=False))
        toks, _ = beam_search(
            model, {"params": p}, jnp.asarray(tb["src"]),
            jnp.asarray(tb["src_len"]), BeamConfig(beam_size=5, max_len=12),
        )
        hyp = tokens_to_sentences(toks, test.tgt_vocab)
        refs = [test.tgt_vocab.decode(t) for t in test.tgt]
        order = [int(i) for i in tb["index"]]
        return corpus_bleu(hyp, [refs[i] for i in order])

    teacher = make_seq2seq("student_medium", len(corpus.src_vocab),
                           len(corpus.tgt_vocab), dropout=0.0)
    tstate, _ = train_model(teacher)
    tvars = {"params": tstate.params}
    tbleu = bleu_of(teacher, tstate.params, None)
    print(f"[nmt] teacher (256h) BLEU {tbleu:.1f}", flush=True)

    widths = {"narrow_64h": dict(hidden=64, embed_dim=64),
              "wide_128h": dict(hidden=128, embed_dim=128)}
    grid = {}
    for name, kw in widths.items():
        student = make_seq2seq("student_small", len(corpus.src_vocab),
                              len(corpus.tgt_vocab), dropout=0.0, **kw)
        for bits in (None, 4, 2):
            sstate, _ = train_model(student, teacher, tvars, bits)
            b = bleu_of(student, sstate.params, bits)
            grid[f"{name}@{bits or 'fp32'}"] = round(float(b), 2)
            print(f"[nmt] {name} bits={bits or 'fp32'}: BLEU {b:.1f}",
                  flush=True)
    return {"teacher_bleu": round(float(tbleu), 2), "cells": grid}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12, help="CNN student epochs")
    ap.add_argument("--teacher-epochs", type=int, default=10)
    ap.add_argument("--nmt-epochs", type=int, default=6)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--cnn-data", type=int, default=4096)
    ap.add_argument("--wrn-data", type=int, default=2048)
    ap.add_argument("--nmt-data", type=int, default=6000)
    ap.add_argument(
        "--cnn-teacher", default="teacher",
        help="CNN teacher preset (the reference's full 'teacher' by default; "
        "'student_large' is the faster stand-in round 2 used)",
    )
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip-cnn", action="store_true")
    ap.add_argument("--skip-nmt", action="store_true")
    ap.add_argument(
        "--wrn", action="store_true",
        help="run the WRN-28-10 grid (gate G3) — intended for TPU",
    )
    args = ap.parse_args()

    out = {}
    if not args.skip_cnn:
        out["cnn_synthetic_cifar100"] = run_cnn_grid(args)
    if args.wrn:
        out["wrn_synthetic_cifar100"] = run_wrn_grid(args)
    if not args.skip_nmt:
        out["nmt_toy"] = run_nmt_grid(args)

    # the paper's qualitative orderings, asserted where both cells exist
    checks = {}
    cnn = out.get("cnn_synthetic_cifar100", {}).get("cells", {})
    if cnn:
        checks["cnn_4bit_within_2pts_of_fp"] = bool(
            cnn["student_small@4"] >= cnn["student_small@fp32"] - 0.02
        )
        checks["cnn_2bit_degrades_narrow"] = bool(
            cnn["student_small@2"] <= cnn["student_small@4"]
        )
        checks["cnn_widening_recovers_2bit"] = bool(
            cnn["student_medium@2"] >= cnn["student_small@2"]
        )
    wrn = out.get("wrn_synthetic_cifar100", {}).get("cells", {})
    if wrn:
        checks["wrn_4bit_within_2pts_of_fp"] = bool(
            wrn["student_small@4"] >= wrn["student_small@fp32"] - 0.02
        )
        checks["wrn_2bit_degrades_narrow"] = bool(
            wrn["student_small@2"] <= wrn["student_small@4"]
        )
        checks["wrn_widening_recovers_2bit"] = bool(
            wrn["student_medium@2"] >= wrn["student_small@2"]
        )
    nmt = out.get("nmt_toy", {}).get("cells", {})
    if nmt:
        checks["nmt_4bit_within_2bleu_of_fp"] = bool(
            nmt["narrow_64h@4"] >= nmt["narrow_64h@fp32"] - 2.0
        )
        checks["nmt_widening_recovers_2bit"] = bool(
            nmt["wide_128h@2"] >= nmt["narrow_64h@2"]
        )
    out["contract_checks"] = checks
    print(json.dumps(out))


if __name__ == "__main__":
    main()
