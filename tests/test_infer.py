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
        # fused=False: the flax decode_step needs the nested-tuple state
        keys, enc_out, enc_mask, state = encode_packed(
            m, v, dec, src, sl, fused=False
        )
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

class TestFusedDecState:
    """Two-buffer serving state layout (round 5: makes the per-step beam
    reorder two contiguous gathers instead of 2L+1 small ones)."""

    def test_fuse_unfuse_roundtrip(self, setup):
        from quantized_distillation_tpu.serve.infer import (
            encode_packed as ep, fuse_dec_state, unfuse_dec_state,
        )

        m, v, src, sl = setup
        dec = pack_decoder(
            v["params"], m.cfg, 8, compute_dtype=jnp.float32, use_pallas=False
        )
        _, _, _, tup = ep(m, v, dec, src, sl, fused=False)
        fused = fuse_dec_state(tup, dec.compute_dtype)
        back = unfuse_dec_state(fused, len(dec.cells), dec.hidden)
        for (c0, h0), (c1, h1) in zip(tup[0], back[0]):
            np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
            np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
        np.testing.assert_array_equal(np.asarray(tup[1]), np.asarray(back[1]))

    def test_fused_step_matches_tuple_step(self, setup):
        """_decode_body on the fused layout must be bit-identical to the
        nested-tuple layout (same math, different storage)."""
        from quantized_distillation_tpu.serve.infer import (
            encode_packed as ep, fuse_dec_state, unfuse_dec_state,
        )

        m, v, src, sl = setup
        dec = pack_decoder(
            v["params"], m.cfg, 8, compute_dtype=jnp.float32, use_pallas=False
        )
        keys, enc_out, enc_mask, tup = ep(m, v, dec, src, sl, fused=False)
        fused = fuse_dec_state(tup, dec.compute_dtype)
        tok = jnp.asarray([1, 2], jnp.int32)
        st_t, logit_t = packed_decode_step(dec, tup, tok, keys, enc_out, enc_mask)
        st_f, logit_f = packed_decode_step(dec, fused, tok, keys, enc_out, enc_mask)
        np.testing.assert_array_equal(np.asarray(logit_t), np.asarray(logit_f))
        back = unfuse_dec_state(st_f, len(dec.cells), dec.hidden)
        for (c0, h0), (c1, h1) in zip(st_t[0], back[0]):
            np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
            np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
        np.testing.assert_array_equal(np.asarray(st_t[1]), np.asarray(back[1]))

    def test_default_beam_path_uses_fused_state_and_matches_flax(self, setup):
        # beam parity with the flax path already runs through the fused
        # layout (encode_packed default) — assert the default really is
        # fused so the fast layout can't silently revert
        from quantized_distillation_tpu.serve.infer import (
            FusedDecState, encode_packed as ep,
        )

        m, v, src, sl = setup
        dec = pack_decoder(
            v["params"], m.cfg, 8, compute_dtype=jnp.float32, use_pallas=False
        )
        _, _, _, st = ep(m, v, dec, src, sl)
        assert isinstance(st, FusedDecState)
        cfg = BeamConfig(beam_size=3, max_len=8)
        t1, _ = beam_search(m, v, src, sl, cfg)
        t2, _ = beam_search_packed(m, v, dec, src, sl, cfg)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
