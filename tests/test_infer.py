"""Packed inference engine tests: parity with the flax decode path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_distillation_tpu.config import BeamConfig
from quantized_distillation_tpu.models import make_seq2seq
from quantized_distillation_tpu.serve import beam_search
from quantized_distillation_tpu.serve.infer import (
    beam_search_packed,
    encode_packed,
    pack_decoder,
    packed_decode_step,
)


@pytest.fixture(scope="module")
def setup():
    m = make_seq2seq(
        "student_small", 50, 60, hidden=256, embed_dim=128, dropout=0.0,
        num_layers=2,
    )
    src = jnp.asarray([[5, 6, 7, 8], [9, 10, 11, 0]], jnp.int32)
    sl = jnp.asarray([4, 3], jnp.int32)
    tgt = jnp.asarray([[1, 5], [1, 6]], jnp.int32)
    v = m.init(jax.random.PRNGKey(0), src, sl, tgt)
    return m, v, src, sl


class TestPackedDecoder:
    def test_round5_serving_defaults_pinned(self, setup):
        # The round-5 interleaved step-level A/B set fold+lse_shift as the
        # serving default (801.7k vs 750.0k tokens/s, BASELINE round 5) —
        # pin it so a refactor can't silently revert the decision.
        m, v, _, _ = setup
        dec = pack_decoder(v["params"], m.cfg, 4, use_pallas=False)
        assert dec.topk_fold is True
        assert dec.topk_lse_shift is True
        assert dec.topk_pair is False
        assert dec.topk_slots == 2

    def test_step_matches_flax_at_8bit(self, setup):
        m, v, src, sl = setup
        dec = pack_decoder(
            v["params"], m.cfg, 8, compute_dtype=jnp.float32, use_pallas=False
        )
        keys, enc_out, enc_mask, state = encode_packed(m, v, dec, src, sl)
        tok = jnp.asarray([1, 1], jnp.int32)
        _, logit_flax = m.apply(v, state, tok, enc_out, enc_mask, method=m.decode_step)
        _, logit_packed = packed_decode_step(dec, state, tok, keys, enc_out, enc_mask)
        rel = float(jnp.abs(logit_flax - logit_packed).max()) / float(
            jnp.abs(logit_flax).max()
        )
        assert rel < 0.02  # 8-bit quantization noise only

    def test_beam_matches_flax_at_8bit(self, setup):
        m, v, src, sl = setup
        dec = pack_decoder(
            v["params"], m.cfg, 8, compute_dtype=jnp.float32, use_pallas=False
        )
        cfg = BeamConfig(beam_size=3, max_len=8)
        t1, _ = beam_search(m, v, src, sl, cfg)
        t2, _ = beam_search_packed(m, v, dec, src, sl, cfg)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))

    def test_4bit_runs_and_finite(self, setup):
        m, v, src, sl = setup
        dec = pack_decoder(v["params"], m.cfg, 4, use_pallas=False)
        t, s = beam_search_packed(m, v, dec, src, sl, BeamConfig(beam_size=2, max_len=6))
        assert np.isfinite(np.asarray(s)).all()
        assert t.shape == (2, 6)

    def test_codebook_pack_exact(self, setup):
        m, v, src, sl = setup
        pts = jnp.linspace(0.0, 1.0, 16)
        dec = pack_decoder(
            v["params"], m.cfg, 4, points=pts, lut_mode="exact", use_pallas=False
        )
        assert dec.generator.points is not None
        t, s = beam_search_packed(m, v, dec, src, sl, BeamConfig(beam_size=2, max_len=6))
        assert np.isfinite(np.asarray(s)).all()

    def test_codebook_requant8_matches_exact(self, setup):
        # the int8-regrid deployment of a codebook must decode like the LUT
        m, v, src, sl = setup
        pts = jnp.linspace(0.0, 1.0, 16)
        cfg = BeamConfig(beam_size=2, max_len=6)
        d_exact = pack_decoder(
            v["params"], m.cfg, 4, points=pts, lut_mode="exact",
            compute_dtype=jnp.float32, use_pallas=False,
        )
        d_rq = pack_decoder(
            v["params"], m.cfg, 4, points=pts, lut_mode="requant8",
            compute_dtype=jnp.float32, use_pallas=False,
        )
        assert d_rq.generator.points is None and d_rq.generator.bits == 8
        t1, _ = beam_search_packed(m, v, d_exact, src, sl, cfg)
        t2, _ = beam_search_packed(m, v, d_rq, src, sl, cfg)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))

    def test_dot_attention_variant(self):
        m = make_seq2seq(
            "student_small", 30, 30, hidden=256, embed_dim=128, dropout=0.0,
            attn_type="dot",
        )
        src = jnp.asarray([[5, 6, 7]], jnp.int32)
        sl = jnp.asarray([3], jnp.int32)
        v = m.init(jax.random.PRNGKey(0), src, sl, jnp.asarray([[1, 5]], jnp.int32))
        dec = pack_decoder(
            v["params"], m.cfg, 8, compute_dtype=jnp.float32, use_pallas=False
        )
        assert dec.attn_in is None
        cfg = BeamConfig(beam_size=2, max_len=5)
        t1, _ = beam_search(m, v, src, sl, cfg)
        t2, _ = beam_search_packed(m, v, dec, src, sl, cfg)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


class TestFusedTopKBeam:
    """Candidate-based beam (fused generator top-k) vs full-logits beam."""

    def test_candidate_beam_matches_logits_beam(self, setup):
        m, v, src, sl = setup
        dec = pack_decoder(
            v["params"], m.cfg, 8, compute_dtype=jnp.float32, use_pallas=False
        )
        cfg = BeamConfig(beam_size=3, max_len=8)
        t_logits, s_logits = beam_search_packed(m, v, dec, src, sl, cfg, fused_topk=False)
        t_cand, s_cand = beam_search_packed(m, v, dec, src, sl, cfg, fused_topk=True)
        np.testing.assert_array_equal(np.asarray(t_logits), np.asarray(t_cand))
        np.testing.assert_allclose(
            np.asarray(s_logits), np.asarray(s_cand), atol=1e-5
        )

    def test_candidate_beam_matches_flax(self, setup):
        m, v, src, sl = setup
        from quantized_distillation_tpu.serve import beam_search

        dec = pack_decoder(
            v["params"], m.cfg, 8, compute_dtype=jnp.float32, use_pallas=False
        )
        cfg = BeamConfig(beam_size=2, max_len=8)
        t1, _ = beam_search(m, v, src, sl, cfg)
        t2, _ = beam_search_packed(m, v, dec, src, sl, cfg, fused_topk=True)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


class TestPerfProbes:
    """The perf-probe tokens (scripts/ab_bench.py tail decomposition) must
    stay compilable, and the default empty probe must be a true no-op
    (bit-identical decode) — probes are timing-attribution only."""

    def test_empty_probe_is_noop(self, setup):
        m, v, src, sl = setup
        dec = pack_decoder(
            v["params"], m.cfg, 8, compute_dtype=jnp.float32, use_pallas=False
        )
        cfg = BeamConfig(beam_size=3, max_len=6)
        t0, s0 = beam_search_packed(m, v, dec, src, sl, cfg, fused_topk=True)
        t1, s1 = beam_search_packed(
            m, v, dec, src, sl, cfg, fused_topk=True, probe=frozenset()
        )
        np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
        np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))

    @pytest.mark.parametrize(
        "tok", ["nogather", "notopk", "nobook", "noembed"]
    )
    def test_probe_tokens_compile(self, setup, tok):
        m, v, src, sl = setup
        dec = pack_decoder(
            v["params"], m.cfg, 8, compute_dtype=jnp.float32, use_pallas=False
        )
        cfg = BeamConfig(beam_size=3, max_len=6)
        toks, scores = beam_search_packed(
            m, v, dec, src, sl, cfg, fused_topk=True, probe=frozenset({tok})
        )
        assert toks.shape[0] == src.shape[0]
        assert np.all(np.isfinite(np.asarray(scores)))

    @pytest.mark.parametrize("tok", ["btopk", "lazyperm", "btopk+lazyperm"])
    def test_variant_tokens_exact_parity(self, setup, tok):
        """btopk (inline bitonic combine) and lazyperm (deferred state
        reorder) are CORRECT-result experimental variants: tokens must be
        bit-identical to the default candidate beam (incl. tie order)."""
        m, v, src, sl = setup
        dec = pack_decoder(
            v["params"], m.cfg, 8, compute_dtype=jnp.float32, use_pallas=False
        )
        cfg = BeamConfig(beam_size=5, max_len=10)
        t0, s0 = beam_search_packed(m, v, dec, src, sl, cfg, fused_topk=True)
        t1, s1 = beam_search_packed(
            m, v, dec, src, sl, cfg, fused_topk=True,
            probe=frozenset(tok.split("+")),
        )
        np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-5)

    def test_bitonic_topk_matches_lax_with_ties(self):
        from quantized_distillation_tpu.serve.beam import _topk_bitonic

        rng = np.random.default_rng(3)
        for _ in range(20):
            x = rng.standard_normal((8, 25)).astype(np.float32)
            x[rng.random((8, 25)) < 0.4] = -1e9  # finished-beam NEG_INF ties
            v0, i0 = jax.lax.top_k(jnp.asarray(x), 5)
            v1, i1 = _topk_bitonic(jnp.asarray(x), 5)
            np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
            np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
