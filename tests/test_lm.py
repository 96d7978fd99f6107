"""LSTM language-model family (models/lm.py, data/lm.py, lm_task)."""

import jax
import jax.numpy as jnp
import numpy as np

from quantized_distillation_tpu.config import DistillSpec, QuantSpec, TrainConfig
from quantized_distillation_tpu.data import lm_batches, synthetic_lm_corpus
from quantized_distillation_tpu.models import make_lm
from quantized_distillation_tpu.train import (
    build_optimizer,
    create_train_state,
    lm_initial_carry,
    lm_task,
    make_eval_step,
    make_train_step,
)
from quantized_distillation_tpu.train.loops import evaluate


class TestModel:
    def test_forward_shapes_and_carry(self):
        m = make_lm("student_small", vocab=50)
        toks = jnp.ones((3, 7), jnp.int32)
        v = m.init(jax.random.PRNGKey(0), toks)
        logits, carry = m.apply(v, toks)
        assert logits.shape == (3, 7, 50)
        assert len(carry) == m.cfg.num_layers
        assert carry[0][0].shape == (3, m.cfg.hidden)

    def test_carry_threading_matches_full_window(self):
        """decode(t0..t7) == decode(t0..t3) then decode(t4..t7, carry)."""
        m = make_lm("student_small", vocab=40)
        toks = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 40)
        v = m.init(jax.random.PRNGKey(0), toks)
        full, _ = m.apply(v, toks)
        first, carry = m.apply(v, toks[:, :4])
        second, _ = m.apply(v, toks[:, 4:], carry)
        np.testing.assert_allclose(
            np.asarray(full),
            np.concatenate([np.asarray(first), np.asarray(second)], axis=1),
            rtol=1e-5,
            atol=1e-5,
        )

    def test_tied_embeddings_shrink_params(self):
        toks = jnp.ones((1, 4), jnp.int32)
        untied = make_lm("student_small", vocab=500)
        tied = make_lm("student_small", vocab=500, tie_embeddings=True)
        n = lambda mod: sum(
            p.size
            for p in jax.tree.leaves(mod.init(jax.random.PRNGKey(0), toks)["params"])
        )
        assert n(tied) < n(untied)
        logits, _ = tied.apply(tied.init(jax.random.PRNGKey(0), toks), toks)
        assert logits.shape == (1, 4, 500)

    def test_presets_shrink(self):
        toks = jnp.ones((1, 4), jnp.int32)
        sizes = [
            sum(
                p.size
                for p in jax.tree.leaves(
                    make_lm(p_, vocab=100).init(jax.random.PRNGKey(0), toks)["params"]
                )
            )
            for p_ in ["teacher", "student_medium", "student_small"]
        ]
        assert sizes == sorted(sizes, reverse=True)


class TestData:
    def test_synthetic_deterministic_and_shared_language(self):
        a = synthetic_lm_corpus(1000, 64, seed=0)
        b = synthetic_lm_corpus(1000, 64, seed=0)
        np.testing.assert_array_equal(a.tokens, b.tokens)
        # different seed → different stream, same language structure:
        # every observed bigram of c must be a legal bigram of a's chain.
        c = synthetic_lm_corpus(5000, 64, seed=1)
        legal = {
            (int(x), int(y)) for x, y in zip(a.tokens[:-1], a.tokens[1:])
        }
        observed = {
            (int(x), int(y)) for x, y in zip(c.tokens[:-1], c.tokens[1:])
        }
        # a's 1000 tokens may not cover every legal bigram, so check overlap
        # is dominant rather than exact containment.
        hit = sum(1 for bg in observed if bg in legal)
        assert hit / len(observed) > 0.5

    def test_batches_contiguous_lanes(self):
        corpus = synthetic_lm_corpus(2000, 32, seed=0)
        ws = list(lm_batches(corpus, batch_size=4, bptt=10))
        assert len(ws) >= 2
        for w in ws:
            assert w["input"].shape == (4, 10)
            # target is input shifted by one within the stream
            np.testing.assert_array_equal(
                w["input"][:, 1:], w["target"][:, :-1]
            )
        # lane continuity across windows: next window's first input token is
        # the previous window's last target token.
        np.testing.assert_array_equal(ws[1]["input"][:, 0], ws[0]["target"][:, -1])


class TestTraining:
    def test_kd_quantized_training_learns(self):
        corpus = synthetic_lm_corpus(6000, 32, seed=0)
        vocab = len(corpus.vocab)
        teacher = make_lm("student_small", vocab, hidden=64, embed_dim=64)
        student = make_lm("student_small", vocab, hidden=32, embed_dim=32)
        x0 = jnp.zeros((1, 10), jnp.int32)
        tv = teacher.init(jax.random.PRNGKey(0), x0)
        sv = student.init(jax.random.PRNGKey(1), x0)
        quant = QuantSpec(bits=4)
        task = lm_task(student, teacher, tv)
        tx = build_optimizer(TrainConfig(learning_rate=3e-3, clip_norm=5.0))
        state = create_train_state(sv["params"], tx, quant=quant)
        # untrained teacher → low KD weight, CE does the work
        step = make_train_step(
            task, tx, quant=quant, distill=DistillSpec(weight=0.1)
        )
        losses = []
        i = 0
        for _epoch in range(3):
            for batch in lm_batches(corpus, 8, 10):
                b = {k: jnp.asarray(v) for k, v in batch.items()}
                state, m = step(state, b, jax.random.PRNGKey(i))
                losses.append(float(m["loss"]))
                i += 1
        # Markov-chain entropy floor ≈ 1.13 nats; start ≈ ln(28-word vocab).
        assert np.mean(losses[-5:]) < losses[0] * 0.7
        em = make_eval_step(task, quant=quant)(
            state, {k: jnp.asarray(v) for k, v in batch.items()}
        )
        # perplexity terms present and finite under hard-quantized eval
        assert np.isfinite(float(em["nll_sum"]))

    def test_thread_carry_continues_state_across_windows(self):
        """Stateful lm_task: TrainState.carry advances each step, and a
        carry-threaded eval over two windows equals one double-length window
        (the data/lm.py lanes are contiguous, so logits must match)."""
        corpus = synthetic_lm_corpus(4000, 32, seed=0)
        vocab = len(corpus.vocab)
        teacher = make_lm("student_small", vocab, hidden=48, embed_dim=48, dropout=0.0)
        student = make_lm("student_small", vocab, hidden=32, embed_dim=32, dropout=0.0)
        x0 = jnp.zeros((1, 10), jnp.int32)
        tv = teacher.init(jax.random.PRNGKey(0), x0)
        sv = student.init(jax.random.PRNGKey(1), x0)
        task = lm_task(student, teacher, tv, thread_carry=True)
        carry0 = lm_initial_carry(student, 4, teacher)
        tx = build_optimizer(TrainConfig(learning_rate=1e-3))
        state = create_train_state(sv["params"], tx, carry=carry0)
        step = make_train_step(task, tx, distill=DistillSpec(weight=0.1))
        batches = list(lm_batches(corpus, 4, 10))
        state, _ = step(state, {k: jnp.asarray(v) for k, v in batches[0].items()},
                        jax.random.PRNGKey(0))
        # carry moved away from zeros (state threads across steps)
        assert float(jnp.abs(state.carry["student"][0][0]).sum()) > 0
        assert float(jnp.abs(state.carry["teacher"][0][0]).sum()) > 0

        # eval equivalence: two bptt=10 windows threaded == one bptt=20 window
        eval_fn = make_eval_step(task)
        w2 = list(lm_batches(corpus, 4, 20))[:1]
        m_long = evaluate(eval_fn, state, w2,
                          initial_carry=lm_initial_carry(student, 4, teacher))
        m_short = evaluate(eval_fn, state, batches[:2],
                           initial_carry=lm_initial_carry(student, 4, teacher))
        assert abs(m_long["perplexity"] - m_short["perplexity"]) < 1e-3

        # without threading, the second window starts from zeros → differs
        m_reset = evaluate(eval_fn, state, batches[:2],
                           initial_carry=None)
        assert abs(m_reset["perplexity"] - m_long["perplexity"]) > 1e-6
