"""Continuous-batching engine tests.

The load-bearing property (SURVEY.md §7 hard part 2): slot-based continuous
batching must produce EXACTLY the same translations as offline batch beam
search, for any arrival pattern.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_distillation_tpu.config import BeamConfig, ServeConfig
from quantized_distillation_tpu.models import make_seq2seq
from quantized_distillation_tpu.serve import beam_search
from quantized_distillation_tpu.serve.engine import TranslationEngine
from quantized_distillation_tpu.serve.infer import pack_decoder


@pytest.fixture(scope="module")
def setup():
    m = make_seq2seq("student_small", 40, 50, hidden=64, embed_dim=32, dropout=0.0)
    rng = np.random.default_rng(0)
    sents = [list(rng.integers(4, 40, rng.integers(3, 9))) for _ in range(11)]
    src_pad = np.zeros((len(sents), 16), np.int32)
    for i, s in enumerate(sents):
        src_pad[i, : len(s)] = s
    slen = np.asarray([len(s) for s in sents], np.int32)
    v = m.init(
        jax.random.PRNGKey(0),
        jnp.asarray(src_pad),
        jnp.asarray(slen),
        jnp.ones((len(sents), 2), jnp.int32),
    )
    ref, _ = beam_search(
        m, v, jnp.asarray(src_pad), jnp.asarray(slen),
        BeamConfig(beam_size=3, max_len=12),
    )
    return m, v, sents, np.asarray(ref)


def _cfg(slots):
    return ServeConfig(
        max_slots=slots, max_src_len=16, max_tgt_len=12,
        beam=BeamConfig(beam_size=3, max_len=12),
    )


class TestEngineEquivalence:
    def test_all_submitted_upfront(self, setup):
        m, v, sents, ref = setup
        eng = TranslationEngine(m, v, _cfg(4))
        rids = [eng.submit(s) for s in sents]
        res = {c.request_id: c for c in eng.run_until_drained()}
        assert len(res) == len(sents)
        for i, rid in enumerate(rids):
            np.testing.assert_array_equal(res[rid].tokens, ref[i])

    def test_staggered_arrivals(self, setup):
        # new requests arrive while other slots are mid-decode
        m, v, sents, ref = setup
        eng = TranslationEngine(m, v, _cfg(3))
        rids = {}
        res = {}
        arrival = {0: [0, 1], 2: [2], 5: [3, 4, 5], 7: [6, 7, 8, 9, 10]}
        step = 0
        while len(res) < len(sents):
            for i in arrival.get(step, []):
                rids[eng.submit(sents[i])] = i
            for c in eng.step():
                res[c.request_id] = c
            step += 1
            assert step < 200
        for rid, i in rids.items():
            np.testing.assert_array_equal(res[rid].tokens, ref[i])

    def test_single_slot_serializes(self, setup):
        m, v, sents, ref = setup
        eng = TranslationEngine(m, v, _cfg(1))
        rids = [eng.submit(s) for s in sents[:3]]
        res = {c.request_id: c for c in eng.run_until_drained()}
        for i, rid in enumerate(rids):
            np.testing.assert_array_equal(res[rid].tokens, ref[i])

    def test_empty_step_is_noop(self, setup):
        m, v, _, _ = setup
        eng = TranslationEngine(m, v, _cfg(2))
        assert eng.step() == []
        assert eng.steps_run == 0

    def test_packed_decoder_drive(self, setup):
        # engine over the packed inference path decodes like the flax path
        m, v, sents, ref = setup
        dec = pack_decoder(
            v["params"], m.cfg, 8, compute_dtype=jnp.float32, use_pallas=False
        )
        eng = TranslationEngine(m, v, _cfg(4), packed_decoder=dec)
        rids = [eng.submit(s) for s in sents[:6]]
        res = {c.request_id: c for c in eng.run_until_drained()}
        matches = sum(
            (res[rid].tokens == ref[i]).all() for i, rid in enumerate(rids)
        )
        assert matches >= 5  # 8-bit quant noise may flip a rare tie

    def test_n_best_completions(self, setup):
        m, v, sents, ref = setup
        cfg = ServeConfig(
            max_slots=3, max_src_len=16, max_tgt_len=12,
            beam=BeamConfig(beam_size=3, max_len=12, n_best=2),
        )
        eng = TranslationEngine(m, v, cfg)
        rids = [eng.submit(s) for s in sents[:4]]
        res = {c.request_id: c for c in eng.run_until_drained()}
        for i, rid in enumerate(rids):
            c = res[rid]
            assert c.nbest_tokens.shape == (2, 12)
            assert c.nbest_scores[0] >= c.nbest_scores[1]
            np.testing.assert_array_equal(c.nbest_tokens[0], c.tokens)
            np.testing.assert_array_equal(c.tokens, ref[i])

    @pytest.mark.parametrize("admit_batch,chunk_steps", [(2, 4), (8, 3), (1, 1)])
    def test_chunked_batched_admission_equivalence(
        self, setup, admit_batch, chunk_steps
    ):
        # batched admission (scatter insert) + chunked stepping must still
        # reproduce offline beam search exactly, for staggered arrivals
        m, v, sents, ref = setup
        cfg = ServeConfig(
            max_slots=3, max_src_len=16, max_tgt_len=12,
            beam=BeamConfig(beam_size=3, max_len=12),
            admit_batch=admit_batch, chunk_steps=chunk_steps,
        )
        eng = TranslationEngine(m, v, cfg)
        rids = {}
        res = {}
        arrival = {0: [0, 1], 1: [2, 3, 4, 5], 3: [6, 7, 8, 9, 10]}
        chunk = 0
        while len(res) < len(sents):
            for i in arrival.get(chunk, []):
                rids[eng.submit(sents[i])] = i
            for c in eng.step():
                res[c.request_id] = c
            chunk += 1
            assert chunk < 200
        for rid, i in rids.items():
            np.testing.assert_array_equal(res[rid].tokens, ref[i])

    def test_throughput_counters(self, setup):
        m, v, sents, _ = setup
        eng = TranslationEngine(m, v, _cfg(4))
        for s in sents[:4]:
            eng.submit(s)
        eng.run_until_drained()
        assert eng.steps_run == 12  # all four decode to max_tgt_len in lockstep
        assert eng.tokens_emitted == 4 * 12

    def test_ring_wraparound_across_many_requests(self, setup):
        """Serve enough sequential work through one slot that the history
        ring wraps several times; every completion must still reconstruct
        exactly (windows of different epochs share ring rows)."""
        m, v, sents, ref = setup
        eng = TranslationEngine(m, v, _cfg(1))
        # ring depth = 12 + 64 = 76; 11 sentences x 12 steps = 132 global
        # steps -> wraps past the ring at least once
        assert eng._t_hist == 76
        rids = [eng.submit(s) for s in sents]
        res = {c.request_id: c for c in eng.run_until_drained()}
        assert eng.steps_run > eng._t_hist  # the ring actually wrapped
        for i, rid in enumerate(rids):
            np.testing.assert_array_equal(res[rid].tokens, ref[i])

    def test_adaptive_chunking_equivalence(self, setup):
        # chunk length varies per chunk at runtime (chunk_steps_busy while
        # the queue is non-empty) — decode results must be unchanged
        m, v, sents, ref = setup
        cfg = ServeConfig(
            max_slots=3, max_src_len=16, max_tgt_len=12,
            beam=BeamConfig(beam_size=3, max_len=12),
            admit_batch=4, chunk_steps=4, chunk_steps_busy=1,
        )
        eng = TranslationEngine(m, v, cfg)
        rids = {}
        res = {}
        arrival = {0: [0, 1], 1: [2, 3, 4, 5], 3: [6, 7, 8, 9, 10]}
        chunk = 0
        while len(res) < len(sents):
            for i in arrival.get(chunk, []):
                rids[eng.submit(sents[i])] = i
            for c in eng.step():
                res[c.request_id] = c
            chunk += 1
            assert chunk < 400
        for rid, i in rids.items():
            np.testing.assert_array_equal(res[rid].tokens, ref[i])

    def test_explicit_chunk_steps_arg(self, setup):
        m, v, sents, ref = setup
        eng = TranslationEngine(m, v, _cfg(2))
        rid = eng.submit(sents[0])
        out = []
        for n in (1, 3, 2, 6):  # different runtime chunk lengths, one program
            out.extend(eng.step(chunk_steps=n))
        assert eng.steps_run == 12
        assert out and out[0].request_id == rid
        np.testing.assert_array_equal(out[0].tokens, ref[0])

    @pytest.mark.parametrize("stage_ahead", [1, 2])
    def test_admit_ahead_staging_equivalence(self, setup, stage_ahead):
        # load smoothing (round-4 verdict item 2): with stage_ahead > 0,
        # queued sentences are pre-encoded while slots are busy and admitted
        # by a single scatter — results must be identical to the unstaged
        # engine for any arrival pattern, including partial-batch admission
        # (more staged rows than free slots).
        m, v, sents, ref = setup
        cfg = ServeConfig(
            max_slots=3, max_src_len=16, max_tgt_len=12,
            beam=BeamConfig(beam_size=3, max_len=12),
            admit_batch=4, stage_ahead=stage_ahead,
        )
        eng = TranslationEngine(m, v, cfg)
        rids, res = {}, {}
        # burst larger than slots+admit_batch: forces staging across chunks
        arrival = {0: [0, 1, 2, 3, 4, 5, 6, 7], 5: [8, 9, 10]}
        step = 0
        while len(res) < len(sents):
            for i in arrival.get(step, []):
                rids[eng.submit(sents[i])] = i
            for c in eng.step():
                res[c.request_id] = c
            step += 1
            assert step < 200
        for rid, i in rids.items():
            np.testing.assert_array_equal(res[rid].tokens, ref[i])

    def test_staged_pending_counts_and_drain(self, setup):
        m, v, sents, ref = setup
        cfg = ServeConfig(
            max_slots=2, max_src_len=16, max_tgt_len=12,
            beam=BeamConfig(beam_size=3, max_len=12),
            admit_batch=2, stage_ahead=2,
        )
        eng = TranslationEngine(m, v, cfg)
        rids = [eng.submit(s) for s in sents[:7]]
        eng.step()  # admits 2, stages up to 4, leaves 1 queued
        assert eng.active_slots == 2
        assert eng.pending == 5  # staged + queued both count
        res = {c.request_id: c for c in eng.run_until_drained()}
        assert len(res) == 7
        for i, rid in enumerate(rids):
            np.testing.assert_array_equal(res[rid].tokens, ref[i])

    def test_coverage_penalty_engine_matches_offline(self, setup):
        # GNMT coverage penalty in the ENGINE (round-4 verdict item 4): the
        # grid's [S, K, T_src] coverage accumulator — reset on admission,
        # gathered by parent, applied at extraction — must reproduce the
        # offline coverage-penalty beam search exactly, staggered arrivals
        # included (admission resets mid-serve).
        m, v, sents, ref_plain = setup
        bc = BeamConfig(
            beam_size=3, max_len=12, length_penalty=0.6, coverage_penalty=0.4
        )
        src_pad = np.zeros((len(sents), 16), np.int32)
        for i, s in enumerate(sents):
            src_pad[i, : len(s)] = s
        slen = np.asarray([len(s) for s in sents], np.int32)
        ref, ref_scores = beam_search(
            m, v, jnp.asarray(src_pad), jnp.asarray(slen), bc
        )
        ref, ref_scores = np.asarray(ref), np.asarray(ref_scores)
        cfg = ServeConfig(
            max_slots=3, max_src_len=16, max_tgt_len=12, beam=bc
        )
        eng = TranslationEngine(m, v, cfg)
        rids, res = {}, {}
        arrival = {0: [0, 1], 2: [2, 3, 4], 4: [5, 6, 7, 8, 9, 10]}
        step = 0
        while len(res) < len(sents):
            for i in arrival.get(step, []):
                rids[eng.submit(sents[i])] = i
            for c in eng.step():
                res[c.request_id] = c
            step += 1
            assert step < 200
        for rid, i in rids.items():
            np.testing.assert_array_equal(res[rid].tokens, ref[i])
            np.testing.assert_allclose(res[rid].score, ref_scores[i], rtol=1e-5)

    def test_coverage_penalty_packed_engine(self, setup):
        # same property over the packed inference path (fused-candidate beam
        # core returning align): engine == offline packed beam search
        m, v, sents, _ = setup
        bc = BeamConfig(beam_size=3, max_len=12, coverage_penalty=0.4)
        from quantized_distillation_tpu.serve.infer import beam_search_packed

        dec = pack_decoder(
            v["params"], m.cfg, 8, compute_dtype=jnp.float32, use_pallas=False
        )
        src_pad = np.zeros((6, 16), np.int32)
        for i, s in enumerate(sents[:6]):
            src_pad[i, : len(s)] = s
        slen = np.asarray([len(s) for s in sents[:6]], np.int32)
        ref, _ = beam_search_packed(
            m, v, dec, jnp.asarray(src_pad), jnp.asarray(slen), bc
        )
        ref = np.asarray(ref)
        cfg = ServeConfig(max_slots=3, max_src_len=16, max_tgt_len=12, beam=bc)
        eng = TranslationEngine(m, v, cfg, packed_decoder=dec)
        rids = [eng.submit(s) for s in sents[:6]]
        res = {c.request_id: c for c in eng.run_until_drained()}
        for i, rid in enumerate(rids):
            np.testing.assert_array_equal(res[rid].tokens, ref[i])

    def test_large_t_max_same_results(self, setup):
        # backpointer histories: per-step cost and results are t_max-
        # independent; a 16x-deeper grid must match offline at that depth
        m, v, sents, _ = setup
        t_big = 192
        src_pad = np.zeros((5, 16), np.int32)
        for i, s in enumerate(sents[:5]):
            src_pad[i, : len(s)] = s
        slen = np.asarray([len(s) for s in sents[:5]], np.int32)
        ref_big, _ = beam_search(
            m, v, jnp.asarray(src_pad), jnp.asarray(slen),
            BeamConfig(beam_size=3, max_len=t_big),
        )
        cfg = ServeConfig(
            max_slots=3, max_src_len=16, max_tgt_len=t_big,
            beam=BeamConfig(beam_size=3, max_len=t_big),
        )
        eng = TranslationEngine(m, v, cfg)
        rids = [eng.submit(s) for s in sents[:5]]
        res = {c.request_id: c for c in eng.run_until_drained()}
        for i, rid in enumerate(rids):
            np.testing.assert_array_equal(res[rid].tokens, np.asarray(ref_big)[i])


def test_drive_chunks_advances_and_syncs(setup):
    """Public timing entry point (bench.py --engine): pipelined chunk
    dispatches report emitted tokens and leave the engine structurally
    valid (the donated grid is rebound)."""
    m, v, sents, ref = setup
    cfg = _cfg(4)
    eng = TranslationEngine(m, v, cfg)
    for s in sents[: cfg.max_slots]:
        eng.submit(s)
    eng.step()
    em = eng.drive_chunks(3)
    # force_active: every slot counts each inner step of the last chunk
    assert em == cfg.max_slots * cfg.chunk_steps
    em2 = eng.drive_chunks(1, force_active=False)
    assert em2 >= 0
