"""CIFAR-100 WideResNet: quantized distillation + differentiable quantization
(BASELINE config 2).

Reference workflow: WRN teacher → smaller student distilled at 2/4-bit, then
*differentiable quantization* — freeze the student weights and learn the
per-layer quantization point locations by gradient descent
(quantization/help_functions.py::optimize_quantization_points) — with
optional automatic bit-width assignment and Huffman-accounted size.

  python examples/cifar100_wrn_diffquant.py --bits 2 --student student_small
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bits", type=int, default=2)
    p.add_argument("--student", default="student_small")
    p.add_argument("--teacher", default="student_medium",
                   help="WRN preset (use 'teacher' for WRN-28-10)")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--teacher-epochs", type=int, default=8)
    p.add_argument("--diffquant-epochs", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--points-lr", type=float, default=1e-3)
    p.add_argument("--kd-weight", type=float, default=0.7)
    p.add_argument("--kd-temperature", type=float, default=5.0)
    p.add_argument("--codebook-init", default="quantile",
                   choices=["uniform", "quantile"])
    p.add_argument("--auto-bits", type=float, default=None,
                   help="target mean bits for automatic per-layer assignment")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--synthetic-size", type=int, default=None)
    p.add_argument("--workdir", default="runs/cifar100_wrn")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from quantized_distillation_tpu.config import DistillSpec, QuantSpec, TrainConfig
    from quantized_distillation_tpu.data import batches, load_cifar
    from quantized_distillation_tpu.data.cifar import BASE_DATA_FOLDER
    from quantized_distillation_tpu.models import make_wrn
    from quantized_distillation_tpu.ops.sizes import model_size_report
    from quantized_distillation_tpu.train import (
        build_optimizer,
        create_train_state,
        make_eval_step,
        vision_task,
    )
    from quantized_distillation_tpu.train import quantize_tree as qt
    from quantized_distillation_tpu.train.bits import assign_bits, gradient_sensitivities
    from quantized_distillation_tpu.train.loops import evaluate, fit
    from quantized_distillation_tpu.train.manager import ExperimentManager
    from quantized_distillation_tpu.utils.metrics import MetricsLogger

    data_dir = args.data_dir or BASE_DATA_FOLDER
    train_ds = load_cifar(100, True, data_dir, args.synthetic_size, args.seed)
    test_ds = load_cifar(100, False, data_dir, args.synthetic_size, args.seed)
    logger = MetricsLogger(os.path.join(args.workdir, "metrics.jsonl"))
    logger.log("data", source=train_ds.source, n_train=len(train_ds.labels))
    mgr = ExperimentManager(args.workdir)

    def train_stream(epoch):
        return batches(
            train_ds, args.batch_size, train_augment=True, seed=args.seed + epoch
        )

    def eval_stream():
        return batches(test_ds, args.batch_size, shuffle=False, drop_remainder=False)

    x0 = jnp.zeros((1, 32, 32, 3))

    # ---- teacher WRN (FP32) ----
    teacher = make_wrn(args.teacher, num_classes=100)
    tname = f"wrn_{args.teacher}_fp32"
    tv = teacher.init(jax.random.PRNGKey(args.seed), x0)
    ttask = vision_task(teacher)
    tcfg = TrainConfig(
        epochs=args.teacher_epochs, learning_rate=args.lr,
        batch_size=args.batch_size, seed=args.seed, lr_schedule="cosine",
    )
    ttx = build_optimizer(tcfg, steps_per_epoch=max(len(train_ds.labels) // args.batch_size, 1))
    tstate = create_train_state(tv["params"], ttx, batch_stats=tv["batch_stats"])
    if mgr.resume_or_register(tname, vars(args)):
        tstate = mgr.restore(tname, tstate)
    else:
        tstate = fit(
            ttask, tstate, tcfg, train_stream, eval_batches=eval_stream,
            tx=ttx, logger=logger, manager=mgr, model_name=tname,
        )
    teacher_vars = {"params": tstate.params, "batch_stats": tstate.batch_stats}
    tacc = evaluate(make_eval_step(ttask), tstate, eval_stream())["accuracy"]
    logger.log("teacher_eval", accuracy=tacc)

    # ---- student: KD with uniform fake-quant (warm start) ----
    student = make_wrn(args.student, num_classes=100)
    quant = QuantSpec(bits=args.bits)
    sname = f"wrn_{args.student}_{args.bits}bit"
    sv = student.init(jax.random.PRNGKey(args.seed + 1), x0)
    stask = vision_task(student, teacher, teacher_vars)
    scfg = TrainConfig(
        epochs=args.epochs, learning_rate=args.lr, batch_size=args.batch_size,
        seed=args.seed, quant=quant,
        distill=DistillSpec(weight=args.kd_weight, temperature=args.kd_temperature),
    )
    stx = build_optimizer(scfg)
    sstate = create_train_state(
        sv["params"], stx, batch_stats=sv["batch_stats"], quant=quant
    )
    if not mgr.has_model(sname):
        mgr.add_new_model(sname, vars(args))
    sstate = fit(
        stask, sstate, scfg, train_stream, eval_batches=eval_stream,
        tx=stx, logger=logger, manager=mgr, model_name=sname,
    )
    uacc = evaluate(make_eval_step(stask, quant=quant), sstate, eval_stream())[
        "accuracy"
    ]
    logger.log("student_uniform_eval", accuracy=uacc)

    # ---- optional automatic bit assignment ----
    bits_map = None
    if args.auto_bits:
        def loss_for_bits(params, batch):
            variables = {"params": params, "batch_stats": sstate.batch_stats}
            logits = student.apply(variables, batch["image"], train=False)
            from quantized_distillation_tpu.train.losses import cross_entropy
            return cross_entropy(logits, batch["label"])

        sens_batches = [
            {k: jnp.asarray(v) for k, v in b.items()}
            for _, b in zip(range(3), train_stream(0))
        ]
        sens = gradient_sensitivities(loss_for_bits, sstate.params, sens_batches, quant)
        bits_map = assign_bits(qt.param_sizes(sstate.params), sens, args.auto_bits)
        logger.log("auto_bits", mean_target=args.auto_bits,
                   assigned=str(sorted(set(bits_map.values()))))

    # ---- differentiable quantization: learn codebooks, weights frozen ----
    dq_quant = QuantSpec(bits=args.bits, method="codebook")
    dq_cfg = TrainConfig(
        epochs=args.diffquant_epochs, learning_rate=args.points_lr,
        batch_size=args.batch_size, seed=args.seed, quant=dq_quant,
        distill=DistillSpec(weight=args.kd_weight, temperature=args.kd_temperature),
    )
    dq_tx = build_optimizer(dq_cfg)
    dq_state = create_train_state(
        sstate.params, dq_tx, batch_stats=sstate.batch_stats, quant=dq_quant,
        codebook_init=args.codebook_init, mode="codebooks",
    )
    dq_state = fit(
        stask, dq_state, dq_cfg, train_stream, eval_batches=eval_stream,
        tx=dq_tx, mode="codebooks", logger=logger,
    )
    dacc = evaluate(make_eval_step(stask, quant=dq_quant), dq_state, eval_stream())[
        "accuracy"
    ]

    # ---- Huffman-accounted size ----
    streams = qt.index_streams(dq_state.params, dq_quant, dq_state.codebooks)
    rep = model_size_report(
        qt.param_sizes(dq_state.params),
        bits_map or args.bits,
        scaling=dq_quant.scaling,
        index_streams=streams,
        exclude=[k for k in qt.param_sizes(dq_state.params) if k not in streams],
    )
    logger.log(
        "final",
        teacher_accuracy=tacc,
        student_uniform_accuracy=uacc,
        student_diffquant_accuracy=dacc,
        size_mb=rep.total_mb,
        compression_ratio=rep.compression_ratio,
        data_source=train_ds.source,
    )
    mgr.record_run(
        sname, "differentiable_quantization", vars(args),
        {"uniform_acc": uacc, "diffquant_acc": dacc,
         "compression_ratio": rep.compression_ratio},
    )


if __name__ == "__main__":
    main()
