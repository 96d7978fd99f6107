"""Seq2seq quantized distillation + beam-search BLEU (BASELINE configs 3/4).

Reference workflow (translation_models/help_fun.py + onmt): train/load an
NMT teacher, word-level-distill a smaller student with fake-quantized
weights, evaluate perplexity and beam-search BLEU, report compressed size
(2-bit adds the learned-codebook + Huffman path).

Data: real parallel corpora via --src-train/--tgt-train/... — either
pre-tokenized (one sentence per line, whitespace tokens) or RAW text with
--raw-text (full WMT13-fidelity loop: Moses-style tokenize -> optional
--bpe-merges BPE -> train -> beam decode -> detokenize -> detok BLEU, with
the pipelines/vocabs serialized into --workdir for serve-time reuse);
else the deterministic toy reversal corpus (clearly labelled).

  python examples/wmt_distill.py --bits 4 --epochs 10
  python examples/wmt_distill.py --raw-text --bpe-merges 8000 \\
      --src-train train.de --tgt-train train.en \\
      --src-test test.de --tgt-test test.en
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def bleu_eval(model, params, corpus, beam_cfg, batch_size=64, tgt_pipe=None):
    """Tokenized BLEU by default; with ``tgt_pipe`` (raw-text mode) the
    hypotheses AND references are detokenized through the pipeline first and
    scored with mteval-13a detok BLEU (the WMT-comparable number)."""
    from quantized_distillation_tpu.data import nmt_batches
    from quantized_distillation_tpu.serve import beam_search, tokens_to_sentences
    from quantized_distillation_tpu.utils.bleu import corpus_bleu, detok_bleu

    bs = jax.jit(
        lambda s, l: beam_search(model, {"params": params}, s, l, beam_cfg)
    )
    hyps = {}
    for batch in nmt_batches(corpus, batch_size, shuffle=False):
        toks, _ = bs(jnp.asarray(batch["src"]), jnp.asarray(batch["src_len"]))
        for i, sent in zip(batch["index"], tokens_to_sentences(toks, corpus.tgt_vocab)):
            hyps[int(i)] = sent
    refs = [corpus.tgt_vocab.decode(t) for t in corpus.tgt]
    ordered = [hyps[i] for i in range(len(refs))]
    if tgt_pipe is not None:
        return detok_bleu(
            [tgt_pipe.decode_tokens(h) for h in ordered],
            [tgt_pipe.decode_tokens(r) for r in refs],
        )
    return corpus_bleu(ordered, refs)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bits", type=int, default=4)
    p.add_argument("--method", default="uniform", choices=["uniform", "codebook"])
    p.add_argument("--teacher-preset", default="teacher")
    p.add_argument("--student-preset", default="student_small")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--teacher-epochs", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--clip-norm", type=float, default=5.0)
    p.add_argument("--kd-weight", type=float, default=0.5)
    p.add_argument("--kd-temperature", type=float, default=2.0)
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--max-decode-len", type=int, default=32)
    # GNMT GlobalScorer penalties (reference onmt/Beam.py), default off
    p.add_argument("--length-penalty", type=float, default=0.0)
    p.add_argument("--coverage-penalty", type=float, default=0.0)
    # real data (reference: WMT13 de-en preprocessed files)
    p.add_argument("--src-train"), p.add_argument("--tgt-train")
    p.add_argument("--src-test"), p.add_argument("--tgt-test")
    # raw-text mode: Moses-style tokenize (+ optional BPE) + detok BLEU
    p.add_argument("--raw-text", action="store_true",
                   help="train files are RAW text: tokenize/BPE/detok here")
    p.add_argument("--bpe-merges", type=int, default=0,
                   help="BPE merge ops per side (0 = word-level, the paper setting)")
    p.add_argument("--src-lang", default="de"), p.add_argument("--tgt-lang", default="en")
    # toy fallback
    p.add_argument("--toy-size", type=int, default=4000)
    p.add_argument("--toy-vocab", type=int, default=120)
    p.add_argument("--workdir", default="runs/wmt")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from quantized_distillation_tpu.config import (
        BeamConfig, DistillSpec, QuantSpec, TrainConfig,
    )
    from quantized_distillation_tpu.data import (
        load_parallel_files, nmt_batches, toy_corpus,
    )
    from quantized_distillation_tpu.models import make_seq2seq
    from quantized_distillation_tpu.ops.sizes import model_size_report
    from quantized_distillation_tpu.train import (
        build_optimizer, create_train_state, make_eval_step, nmt_task,
    )
    from quantized_distillation_tpu.train import quantize_tree as qt
    from quantized_distillation_tpu.train.loops import evaluate, fit
    from quantized_distillation_tpu.train.manager import ExperimentManager
    from quantized_distillation_tpu.utils.metrics import MetricsLogger

    logger = MetricsLogger(os.path.join(args.workdir, "metrics.jsonl"))
    mgr = ExperimentManager(args.workdir)

    tgt_pipe = None
    if args.src_train and args.tgt_train and args.raw_text:
        from quantized_distillation_tpu.data import load_raw_parallel

        train_c, src_pipe, tgt_pipe = load_raw_parallel(
            args.src_train, args.tgt_train,
            src_lang=args.src_lang, tgt_lang=args.tgt_lang,
            bpe_merges=args.bpe_merges or None,
        )
        test_c, _, _ = load_raw_parallel(
            args.src_test, args.tgt_test,
            src_pipe=src_pipe, tgt_pipe=tgt_pipe,
            src_vocab=train_c.src_vocab, tgt_vocab=train_c.tgt_vocab,
        )
        # serialize preprocessing for serve-time reuse (identical pipeline)
        os.makedirs(args.workdir, exist_ok=True)
        src_pipe.save(args.workdir, "src")
        tgt_pipe.save(args.workdir, "tgt")
        train_c.src_vocab.save(os.path.join(args.workdir, "src.vocab"))
        train_c.tgt_vocab.save(os.path.join(args.workdir, "tgt.vocab"))
    elif args.src_train and args.tgt_train:
        train_c = load_parallel_files(args.src_train, args.tgt_train)
        test_c = load_parallel_files(
            args.src_test, args.tgt_test,
            src_vocab=train_c.src_vocab, tgt_vocab=train_c.tgt_vocab,
        )
    else:
        train_c = toy_corpus(n=args.toy_size, vocab_size=args.toy_vocab,
                             seed=args.seed)
        test_c = toy_corpus(n=max(args.toy_size // 20, 50),
                            vocab_size=args.toy_vocab, seed=args.seed + 991)
    logger.log("data", source=train_c.source, n_train=len(train_c.src),
               src_vocab=len(train_c.src_vocab), tgt_vocab=len(train_c.tgt_vocab))

    sv_n, tv_n = len(train_c.src_vocab), len(train_c.tgt_vocab)
    beam_cfg = BeamConfig(
        beam_size=args.beam, max_len=args.max_decode_len,
        length_penalty=args.length_penalty,
        coverage_penalty=args.coverage_penalty,
    )

    def train_stream(epoch):
        return nmt_batches(train_c, args.batch_size, seed=args.seed + epoch,
                           drop_remainder=True)

    def eval_stream():
        return nmt_batches(test_c, args.batch_size, shuffle=False)

    b0 = next(train_stream(0))

    def init_model(model, key):
        return model.init(
            jax.random.PRNGKey(key), jnp.asarray(b0["src"]),
            jnp.asarray(b0["src_len"]), jnp.asarray(b0["tgt_in"]),
        )

    def token_count(batch):
        return int(np.asarray(batch["tgt_mask"]).sum())

    # ---- teacher (FP32) ----
    teacher = make_seq2seq(args.teacher_preset, sv_n, tv_n)
    tname = f"nmt_{args.teacher_preset}_fp32"
    tv = init_model(teacher, args.seed)
    ttask = nmt_task(teacher)
    tcfg = TrainConfig(epochs=args.teacher_epochs, learning_rate=args.lr,
                       clip_norm=args.clip_norm, seed=args.seed)
    ttx = build_optimizer(tcfg)
    tstate = create_train_state(tv["params"], ttx)
    # Resume the teacher ONLY when the registered run config matches the
    # current invocation (the blind resume-by-name silently reused a stale
    # teacher and poisoned the distillation — see manager.resume_or_register).
    # Only flags that affect the TRAINED TEACHER WEIGHTS participate: decode/
    # eval knobs (--beam, penalties, test paths) and student-only flags must
    # not invalidate a reusable teacher checkpoint.
    teacher_keys = (
        "teacher_preset", "teacher_epochs", "batch_size", "lr", "clip_norm",
        "seed", "src_train", "tgt_train", "raw_text", "bpe_merges",
        "src_lang", "tgt_lang", "toy_size", "toy_vocab",
    )
    tconfig = {k: getattr(args, k) for k in teacher_keys}
    if mgr.resume_or_register(tname, tconfig):
        tstate = mgr.restore(tname, tstate)
        logger.log("teacher_resume", step=float(mgr.latest_step(tname)))
    else:
        tstate = fit(ttask, tstate, tcfg, train_stream, eval_batches=eval_stream,
                     tx=ttx, logger=logger, manager=mgr, model_name=tname,
                     item_count=token_count)
    t_bleu = bleu_eval(teacher, tstate.params, test_c, beam_cfg,
                       args.batch_size, tgt_pipe=tgt_pipe)
    logger.log("teacher_eval", bleu=t_bleu)

    # ---- student: quantized word-level distillation ----
    student = make_seq2seq(args.student_preset, sv_n, tv_n)
    quant = QuantSpec(bits=args.bits, method=args.method)
    sname = f"nmt_{args.student_preset}_{args.bits}bit_{args.method}"
    sv = init_model(student, args.seed + 1)
    teacher_vars = {"params": tstate.params}
    stask = nmt_task(student, teacher, teacher_vars)
    scfg = TrainConfig(
        epochs=args.epochs, learning_rate=args.lr, clip_norm=args.clip_norm,
        seed=args.seed, quant=quant,
        distill=DistillSpec(weight=args.kd_weight, temperature=args.kd_temperature),
    )
    stx = build_optimizer(scfg)
    mode = "joint" if args.method == "codebook" else "weights"
    sstate = create_train_state(sv["params"], stx, quant=quant,
                                codebook_init="uniform", mode=mode)
    if not mgr.has_model(sname):
        mgr.add_new_model(sname, vars(args))
    sstate = fit(stask, sstate, scfg, train_stream, eval_batches=eval_stream,
                 tx=stx, mode=mode, logger=logger, manager=mgr, model_name=sname,
                 item_count=token_count)

    # quantized-deploy eval: hard-quantize weights, then perplexity + BLEU
    q_params = qt.quantize_tree_hard(sstate.params, quant, sstate.codebooks)
    ppl = evaluate(make_eval_step(stask, quant=quant), sstate, eval_stream())
    s_bleu = bleu_eval(student, q_params, test_c, beam_cfg,
                       args.batch_size, tgt_pipe=tgt_pipe)

    streams = qt.index_streams(sstate.params, quant, sstate.codebooks)
    rep = model_size_report(
        qt.param_sizes(sstate.params), args.bits, scaling=quant.scaling,
        index_streams=streams,
        exclude=[k for k in qt.param_sizes(sstate.params) if k not in streams],
    )
    logger.log(
        "final",
        teacher_bleu=t_bleu,
        student_quantized_bleu=s_bleu,
        student_perplexity=ppl.get("perplexity", float("nan")),
        size_mb=rep.total_mb,
        compression_ratio=rep.compression_ratio,
        data_source=train_c.source,
    )
    mgr.record_run(sname, "nmt_quantized_distillation", vars(args),
                   {"bleu": s_bleu, "teacher_bleu": t_bleu,
                    "compression_ratio": rep.compression_ratio})


if __name__ == "__main__":
    main()
