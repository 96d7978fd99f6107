"""ImageNet-family ResNet quantized distillation.

The paper's ImageNet experiments distill a ResNet teacher into a narrower
quantized ResNet student (reference code tagged [L] in SURVEY §0 — would use
torchvision ResNets through the same train loop). This driver runs that
workflow: train/load an FP32 ResNet teacher, distill a width-reduced student
with fake-quantized weights (STE, 2/4/8-bit bucketed), report quantized
top-1 and compressed size.

Runs on downsampled-ImageNet npy packs if present under --data-dir
(``{train,val}_images.npy`` + labels), else on the synthetic stand-in
(clearly labelled). Default resolution 64 (Imagenet64-style).

  python examples/imagenet_resnet_distill.py --bits 4 \
      --teacher resnet18 --student resnet18_half --num-classes 100
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
    p.add_argument("--bits", type=int, default=4)
    p.add_argument("--student", default="resnet18_half")
    p.add_argument("--teacher", default="resnet18")
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--teacher-epochs", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--kd-weight", type=float, default=0.7)
    p.add_argument("--kd-temperature", type=float, default=5.0)
    p.add_argument("--stochastic", action="store_true")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--image-size", type=int, default=64)
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--synthetic-size", type=int, default=None)
    p.add_argument("--workdir", default="runs/imagenet")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from quantized_distillation_tpu.config import DistillSpec, QuantSpec, TrainConfig
    from quantized_distillation_tpu.data import batches, load_imagenet
    from quantized_distillation_tpu.data.cifar import BASE_DATA_FOLDER
    from quantized_distillation_tpu.models import make_resnet
    from quantized_distillation_tpu.ops.sizes import model_size_report
    from quantized_distillation_tpu.train import (
        build_optimizer,
        create_train_state,
        make_eval_step,
        vision_task,
    )
    from quantized_distillation_tpu.train import quantize_tree as qt
    from quantized_distillation_tpu.train.loops import evaluate, fit
    from quantized_distillation_tpu.train.manager import ExperimentManager
    from quantized_distillation_tpu.utils.metrics import MetricsLogger

    data_dir = args.data_dir or BASE_DATA_FOLDER
    kw = dict(
        data_dir=data_dir, image_size=args.image_size,
        num_classes=args.num_classes, synthetic_size=args.synthetic_size,
        seed=args.seed,
    )
    train_ds = load_imagenet(True, **kw)
    test_ds = load_imagenet(False, **{**kw, "synthetic_size": (args.synthetic_size or 2000) // 4 or None})
    num_classes = train_ds.num_classes
    logger = MetricsLogger(os.path.join(args.workdir, "metrics.jsonl"))
    logger.log(
        "data", source=train_ds.source, n_train=len(train_ds.labels),
        image_size=args.image_size, num_classes=num_classes,
    )
    mgr = ExperimentManager(args.workdir)
    small = args.image_size <= 64

    def train_stream(ds, augment_):
        def gen(epoch):
            return batches(
                ds, args.batch_size, train_augment=augment_, seed=args.seed + epoch
            )
        return gen

    def eval_stream():
        return batches(test_ds, args.batch_size, shuffle=False, drop_remainder=False)

    x0 = jnp.zeros((1, args.image_size, args.image_size, 3))

    # ---- teacher: FP32 training (or reload) ----
    teacher = make_resnet(args.teacher, num_classes, small_inputs=small)
    tname = f"imagenet_{args.teacher}_fp32"
    tcfg = TrainConfig(
        epochs=args.teacher_epochs, learning_rate=args.lr,
        batch_size=args.batch_size, seed=args.seed,
    )
    tv = teacher.init(jax.random.PRNGKey(args.seed), x0)
    ttask = vision_task(teacher)
    ttx = build_optimizer(tcfg)
    tstate = create_train_state(tv["params"], ttx, batch_stats=tv["batch_stats"])
    if mgr.resume_or_register(tname, vars(args)):
        tstate = mgr.restore(tname, tstate)
        logger.log("teacher_restored", step=int(tstate.step))
    else:
        tstate = fit(
            ttask, tstate, tcfg, train_stream(train_ds, True),
            eval_batches=eval_stream, tx=ttx, logger=logger,
            manager=mgr, model_name=tname,
        )
    teacher_vars = {"params": tstate.params, "batch_stats": tstate.batch_stats}
    tacc = evaluate(make_eval_step(ttask), tstate, eval_stream())["accuracy"]
    logger.log("teacher_eval", accuracy=tacc)

    # ---- student: quantized distillation ----
    student = make_resnet(args.student, num_classes, small_inputs=small)
    sname = f"imagenet_{args.student}_{args.bits}bit"
    quant = QuantSpec(bits=args.bits, stochastic=args.stochastic)
    scfg = TrainConfig(
        epochs=args.epochs, learning_rate=args.lr, batch_size=args.batch_size,
        seed=args.seed, quant=quant,
        distill=DistillSpec(weight=args.kd_weight, temperature=args.kd_temperature),
    )
    sv = student.init(jax.random.PRNGKey(args.seed + 1), x0)
    stask = vision_task(student, teacher, teacher_vars)
    stx = build_optimizer(scfg)
    sstate = create_train_state(
        sv["params"], stx, batch_stats=sv["batch_stats"], quant=quant
    )
    if not mgr.has_model(sname):
        mgr.add_new_model(sname, vars(args))
    sstate = fit(
        stask, sstate, scfg, train_stream(train_ds, True),
        eval_batches=eval_stream, tx=stx, logger=logger,
        manager=mgr, model_name=sname,
    )

    # ---- report: quantized accuracy + compressed size ----
    sacc = evaluate(make_eval_step(stask, quant=quant), sstate, eval_stream())[
        "accuracy"
    ]
    streams = qt.index_streams(sstate.params, quant)
    rep = model_size_report(
        qt.param_sizes(sstate.params), args.bits,
        scaling=quant.scaling, index_streams=streams,
        exclude=[
            k for k, n in qt.param_sizes(sstate.params).items()
            if k not in streams
        ],
    )
    logger.log(
        "final",
        teacher_accuracy=tacc,
        student_quantized_accuracy=sacc,
        size_mb=rep.total_mb,
        compression_ratio=rep.compression_ratio,
        data_source=train_ds.source,
    )
    mgr.record_run(
        sname, "quantized_distillation", vars(args),
        {"accuracy": sacc, "teacher_accuracy": tacc,
         "compression_ratio": rep.compression_ratio},
    )


if __name__ == "__main__":
    main()
