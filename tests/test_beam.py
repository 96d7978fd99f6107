"""Beam search + BLEU tests, incl. the train→decode→BLEU integration path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_distillation_tpu.config import BeamConfig, TrainConfig
from quantized_distillation_tpu.data import EOS, PAD, nmt_batches, toy_corpus
from quantized_distillation_tpu.models import make_seq2seq
from quantized_distillation_tpu.serve import (
    beam_search,
    greedy_decode,
    length_penalty,
    tokens_to_sentences,
)
from quantized_distillation_tpu.train import (
    build_optimizer,
    create_train_state,
    make_train_step,
    nmt_task,
)
from quantized_distillation_tpu.utils import corpus_bleu


@pytest.fixture(scope="module")
def random_model():
    m = make_seq2seq("student_small", 30, 30, hidden=64, embed_dim=32, dropout=0.0)
    src = jnp.asarray([[5, 6, 7, 8], [9, 10, 0, 0]], jnp.int32)
    src_len = jnp.asarray([4, 2], jnp.int32)
    v = m.init(
        jax.random.PRNGKey(0), src, src_len, jnp.asarray([[1, 5], [1, 6]], jnp.int32)
    )
    return m, v, src, src_len


class TestBeamSearch:
    def test_beam1_matches_stepwise_greedy(self, random_model):
        m, v, src, src_len = random_model
        toks = greedy_decode(m, v, src, src_len, max_len=6)
        # manual stepwise argmax
        enc_out, enc_mask, state = m.apply(v, src, src_len, method=m.encode)
        cur = jnp.full((2,), 1, jnp.int32)
        done = np.zeros(2, bool)
        manual = []
        for _ in range(6):
            state, logits = m.apply(
                v, state, cur, enc_out, enc_mask, method=m.decode_step
            )
            cur = jnp.argmax(logits, -1).astype(jnp.int32)
            row = np.asarray(cur).copy()
            row[done] = PAD
            manual.append(row)
            done |= np.asarray(cur) == EOS
        np.testing.assert_array_equal(np.asarray(toks), np.stack(manual, 1))

    def test_wider_beam_never_worse_score(self, random_model):
        m, v, src, src_len = random_model
        _, s1 = beam_search(m, v, src, src_len, BeamConfig(beam_size=1, max_len=6))
        _, s4 = beam_search(m, v, src, src_len, BeamConfig(beam_size=4, max_len=6))
        assert (np.asarray(s4) >= np.asarray(s1) - 1e-4).all()

    def test_finished_beams_emit_pad(self, random_model):
        m, v, src, src_len = random_model
        toks, _ = beam_search(m, v, src, src_len, BeamConfig(beam_size=3, max_len=8))
        for row in np.asarray(toks):
            if EOS in row:
                after = row[list(row).index(EOS) + 1 :]
                assert (after == PAD).all()

    def test_n_best_sorted_and_consistent_with_best(self, random_model):
        m, v, src, src_len = random_model
        cfg = BeamConfig(beam_size=4, max_len=6, n_best=3)
        toks, scores = beam_search(m, v, src, src_len, cfg)
        assert toks.shape == (2, 3, 6) and scores.shape == (2, 3)
        s = np.asarray(scores)
        assert (s[:, :-1] >= s[:, 1:] - 1e-6).all()  # best first
        t1, s1 = beam_search(m, v, src, src_len, BeamConfig(beam_size=4, max_len=6))
        np.testing.assert_array_equal(np.asarray(toks[:, 0]), np.asarray(t1))
        np.testing.assert_allclose(s[:, 0], np.asarray(s1), rtol=1e-6)

    def test_n_best_must_fit_beam(self, random_model):
        m, v, src, src_len = random_model
        with pytest.raises(ValueError):
            beam_search(
                m, v, src, src_len, BeamConfig(beam_size=2, max_len=4, n_best=3)
            )

    def test_length_penalty(self):
        lp = length_penalty(jnp.asarray([5]), 0.0)
        assert float(lp[0]) == 1.0
        lp2 = length_penalty(jnp.asarray([1, 25]), 1.0)
        assert float(lp2[0]) < float(lp2[1])


class TestBackpointers:
    def test_reconstruct_matches_python_walk(self):
        """Backpointer reconstruction (reference onmt/Beam.py get_hyp) vs an
        independent per-hypothesis python walk, on random histories
        (storage is time-major flat [T, B*K]; output [B, K, T])."""
        from quantized_distillation_tpu.serve import reconstruct_tokens

        rng = np.random.default_rng(3)
        b, k, t = 4, 5, 13
        sym = rng.integers(0, 50, (t, b, k)).astype(np.int32)
        par = rng.integers(0, k, (t, b, k)).astype(np.int8)
        out = np.asarray(
            reconstruct_tokens(
                jnp.asarray(sym.reshape(t, b * k)),
                jnp.asarray(par.reshape(t, b * k)),
                k,
            )
        )
        for bi in range(b):
            for ki in range(k):
                cur = ki
                for ti in range(t - 1, -1, -1):
                    assert out[bi, ki, ti] == sym[ti, bi, cur]
                    cur = par[ti, bi, cur]

    def test_identity_parents_reconstruct_in_place(self):
        from quantized_distillation_tpu.serve import reconstruct_tokens

        rng = np.random.default_rng(4)
        sym = rng.integers(0, 9, (6, 2, 3)).astype(np.int32)
        par = np.tile(np.arange(3, dtype=np.int8), (6, 2, 1))
        out = np.asarray(
            reconstruct_tokens(
                jnp.asarray(sym.reshape(6, 6)), jnp.asarray(par.reshape(6, 6)), 3
            )
        )
        np.testing.assert_array_equal(out, np.moveaxis(sym, 0, 2))

    def test_ring_window_unroll(self):
        """unroll_ring must align each slot's wrapped window to step order
        and mask other epochs' rows to PAD/identity."""
        from quantized_distillation_tpu.serve import (
            reconstruct_tokens, unroll_ring,
        )

        rng = np.random.default_rng(5)
        tp, e, k = 10, 2, 3
        sym = rng.integers(5, 50, (tp, e, k)).astype(np.int32)
        par = rng.integers(0, k, (tp, e, k)).astype(np.int8)
        start = np.asarray([7, 2], np.int32)  # slot 0 wraps (7,8,9,0,1)
        tlen = np.asarray([5, 4], np.int32)
        sym_a, par_a = unroll_ring(
            jnp.asarray(sym.reshape(tp, e * k)),
            jnp.asarray(par.reshape(tp, e * k)),
            jnp.asarray(start), jnp.asarray(tlen), beam_size=k,
        )
        sym_a = np.asarray(sym_a).reshape(tp, e, k)
        par_a = np.asarray(par_a).reshape(tp, e, k)
        for ei in range(e):
            for tt in range(tp):
                if tt < tlen[ei]:
                    src = (start[ei] + tt) % tp
                    assert (sym_a[tt, ei] == sym[src, ei]).all()
                    assert (par_a[tt, ei] == par[src, ei]).all()
                else:
                    assert (sym_a[tt, ei] == 0).all()  # PAD
                    assert (par_a[tt, ei] == np.arange(k)).all()  # identity
        # and the aligned history backtraces without touching masked rows
        out = np.asarray(
            reconstruct_tokens(
                jnp.asarray(sym_a.reshape(tp, e * k)),
                jnp.asarray(par_a.reshape(tp, e * k)),
                k,
            )
        )
        assert out.shape == (e, k, tp)
        assert (out[0, :, tlen[0]:] == 0).all()


class TestSmallTopK:
    def test_matches_lax_top_k_including_ties(self):
        from quantized_distillation_tpu.serve.beam import _topk_small

        rng = np.random.default_rng(7)
        x = rng.standard_normal((33, 25)).astype(np.float32)
        # plant exact ties (lax.top_k breaks ties by lowest index)
        x[0, 3] = x[0, 17] = 2.5
        x[1, :] = -1e9  # all-NEG_INF row (finished-slot pattern)
        x[2, 5] = x[2, 6] = x[2, 7] = x[2, 8] = x[2, 9] = 4.0
        v, i = _topk_small(jnp.asarray(x), 5)
        vr, ir = jax.lax.top_k(jnp.asarray(x), 5)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(vr))
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ir))


class TestCoveragePenalty:
    def test_penalty_formula_and_padding_mask(self):
        from quantized_distillation_tpu.serve import coverage_penalty

        cov = jnp.asarray([[[0.5, 2.0, 0.0, 1.0]]])  # zero = masked padding
        cp = coverage_penalty(cov, 0.3)
        # min(cov,1): log(0.5) + log(1) + skip + log(1)
        np.testing.assert_allclose(
            np.asarray(cp), [[0.3 * np.log(0.5)]], rtol=1e-6
        )

    def test_greedy_score_shift_matches_manual_coverage(self, random_model):
        """beam_size=1: the coverage-penalized score must equal the raw score
        plus beta*sum(log(min(cov,1))) with coverage accumulated from the
        model's own attention weights while the hypothesis is live."""
        m, v, src, src_len = random_model
        beta, t_max = 0.5, 6
        t0, s0 = beam_search(m, v, src, src_len,
                             BeamConfig(beam_size=1, max_len=t_max))
        t1, s1 = beam_search(
            m, v, src, src_len,
            BeamConfig(beam_size=1, max_len=t_max, coverage_penalty=beta),
        )
        np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
        # manual greedy walk accumulating align
        enc_out, enc_mask, state = m.apply(v, src, src_len, method=m.encode)
        cur = jnp.full((2,), 1, jnp.int32)
        done = np.zeros(2, bool)
        cov = np.zeros((2, src.shape[1]))
        for _ in range(t_max):
            state, logits, align = m.apply(
                v, state, cur, enc_out, enc_mask, method=m.decode_step_attn
            )
            cov += np.where(done[:, None], 0.0, np.asarray(align))
            cur = jnp.argmax(logits, -1).astype(jnp.int32)
            done |= np.asarray(cur) == EOS
        expected = beta * np.where(cov > 0, np.log(np.minimum(cov, 1.0)), 0.0).sum(1)
        np.testing.assert_allclose(
            np.asarray(s1) - np.asarray(s0), expected, rtol=1e-4, atol=1e-5
        )

    def test_packed_paths_agree_with_coverage(self, random_model):
        from quantized_distillation_tpu.serve import beam_search_packed, pack_decoder

        m, v, src, src_len = random_model
        dec = pack_decoder(
            v["params"], m.cfg, 8, compute_dtype=jnp.float32, use_pallas=False
        )
        cfg = BeamConfig(beam_size=3, max_len=8, coverage_penalty=0.4)
        tf_, sf = beam_search_packed(m, v, dec, src, src_len, cfg, fused_topk=True)
        tp, sp = beam_search_packed(m, v, dec, src, src_len, cfg, fused_topk=False)
        np.testing.assert_array_equal(np.asarray(tf_), np.asarray(tp))
        np.testing.assert_allclose(np.asarray(sf), np.asarray(sp), rtol=1e-5)


class TestAttentionOutput:
    """Per-hypothesis attention with the n-best list (reference
    onmt/Translator.py returns attn alongside tokens/scores)."""

    def test_shapes_and_rows_are_distributions(self, random_model):
        m, v, src, src_len = random_model
        cfg = BeamConfig(beam_size=3, max_len=6)
        toks, scores, attn = beam_search(
            m, v, src, src_len, cfg, return_attention=True
        )
        assert attn.shape == (2, 6, src.shape[1])
        a = np.asarray(attn)
        t = np.asarray(toks)
        for b in range(2):
            for step in range(6):
                row = a[b, step]
                if t[b, step] == PAD:
                    # past EOS (or a finished beam): zero attention row
                    np.testing.assert_allclose(row, 0.0, atol=1e-7)
                else:
                    np.testing.assert_allclose(row.sum(), 1.0, rtol=1e-5)
                    # masked source padding gets (near-)zero mass
                    sl = int(np.asarray(src_len)[b])
                    np.testing.assert_allclose(
                        row[sl:], 0.0, atol=1e-6
                    )

    def test_tokens_scores_unchanged_by_attention_request(self, random_model):
        m, v, src, src_len = random_model
        cfg = BeamConfig(beam_size=3, max_len=6)
        t0, s0 = beam_search(m, v, src, src_len, cfg)
        t1, s1, _ = beam_search(
            m, v, src, src_len, cfg, return_attention=True
        )
        np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-6)

    def test_n_best_attention_follows_hypotheses(self, random_model):
        # the n-best attention rows must pair with the n-best token rows:
        # row j of attn is the backtraced attention of hypothesis j
        m, v, src, src_len = random_model
        cfg = BeamConfig(beam_size=4, max_len=6, n_best=3)
        toks, scores, attn = beam_search(
            m, v, src, src_len, cfg, return_attention=True
        )
        assert attn.shape == (2, 3, 6, src.shape[1])
        t = np.asarray(toks)
        a = np.asarray(attn)
        for b in range(2):
            for j in range(3):
                live = t[b, j] != PAD
                np.testing.assert_allclose(
                    a[b, j][live].sum(-1), 1.0, rtol=1e-5
                )
                np.testing.assert_allclose(a[b, j][~live], 0.0, atol=1e-7)

    def test_packed_attention_matches_flax(self, random_model):
        from quantized_distillation_tpu.serve import (
            beam_search_packed, pack_decoder,
        )

        m, v, src, src_len = random_model
        cfg = BeamConfig(beam_size=3, max_len=6)
        dec = pack_decoder(
            v["params"], m.cfg, 8, compute_dtype=jnp.float32, use_pallas=False
        )
        t_f, _, a_f = beam_search(
            m, v, src, src_len, cfg, return_attention=True
        )
        t_p, _, a_p = beam_search_packed(
            m, v, dec, src, src_len, cfg, return_attention=True
        )
        if (np.asarray(t_f) == np.asarray(t_p)).all():
            # same trajectory (8-bit noise may flip ties): attention agrees
            np.testing.assert_allclose(
                np.asarray(a_f), np.asarray(a_p), atol=5e-3
            )


class TestBLEU:
    def test_perfect_match(self):
        h = [["a", "b", "c", "d"], ["x", "y", "z", "w"]]
        assert corpus_bleu(h, h) == pytest.approx(100.0)

    def test_no_match(self):
        assert corpus_bleu([["a", "b", "c", "d"]], [["x", "y", "z", "w"]]) == 0.0

    def test_brevity_penalty(self):
        ref = [["a", "b", "c", "d", "e", "f"]]
        short = [["a", "b", "c", "d"]]
        full = [["a", "b", "c", "d", "e", "f"]]
        assert corpus_bleu(short, ref) < corpus_bleu(full, ref)

    def test_mismatched_counts_raise(self):
        with pytest.raises(ValueError):
            corpus_bleu([["a"]], [["a"], ["b"]])


class TestEndToEndToyNMT:
    def test_train_beam_bleu(self):
        """SURVEY §4 item 4: tiny end-to-end — train on the toy reversal task,
        beam-decode a held-out split, BLEU must be high."""
        corpus = toy_corpus(n=1200, vocab_size=30, min_len=3, max_len=6, seed=0)
        model = make_seq2seq(
            "student_small",
            len(corpus.src_vocab),
            len(corpus.tgt_vocab),
            hidden=64,
            embed_dim=48,
            dropout=0.0,
        )
        b0 = next(nmt_batches(corpus, 64))
        sv = model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(b0["src"]),
            jnp.asarray(b0["src_len"]),
            jnp.asarray(b0["tgt_in"]),
        )
        task = nmt_task(model)
        tx = build_optimizer(TrainConfig(learning_rate=4e-3, clip_norm=5.0))
        state = create_train_state(sv["params"], tx)
        step = make_train_step(task, tx, donate=False)
        rng = jax.random.PRNGKey(1)
        for epoch in range(10):
            for batch in nmt_batches(corpus, 64, seed=epoch, drop_remainder=True):
                batch.pop("index")
                state, m = step(
                    state, {k: jnp.asarray(v) for k, v in batch.items()}, rng
                )
        test = toy_corpus(n=60, vocab_size=30, min_len=3, max_len=6, seed=99)
        bs = jax.jit(
            lambda s, l: beam_search(
                model,
                {"params": state.params},
                s,
                l,
                BeamConfig(beam_size=4, max_len=10),
            )
        )
        hyps = {}
        for batch in nmt_batches(test, 60, shuffle=False):
            toks, _ = bs(jnp.asarray(batch["src"]), jnp.asarray(batch["src_len"]))
            for i, sent in zip(batch["index"], tokens_to_sentences(toks, test.tgt_vocab)):
                hyps[int(i)] = sent
        refs = [test.tgt_vocab.decode(t) for t in test.tgt]
        bleu = corpus_bleu([hyps[i] for i in range(len(refs))], refs)
        assert bleu > 60.0, f"toy BLEU too low: {bleu}"
