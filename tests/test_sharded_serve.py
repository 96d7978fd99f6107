"""Sharded serving (slot-DP × vocab-TP) parity on the 8-device CPU mesh.

Oracle: the single-device packed beam search (serve/infer.py). The sharded
path must produce identical tokens and near-identical scores (the only
numeric difference is the two-stage logsumexp reduction order).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_distillation_tpu.config import BeamConfig
from quantized_distillation_tpu.models import make_seq2seq
from quantized_distillation_tpu.parallel import make_mesh
from quantized_distillation_tpu.serve.infer import (
    beam_search_packed,
    pack_decoder,
)
from quantized_distillation_tpu.serve.sharded import (
    beam_search_sharded,
    make_sharded_decode_step_topk,
    pack_generator_sharded,
    shard_decoder,
)

VOCAB = 64


@pytest.fixture(scope="module")
def setup():
    m = make_seq2seq(
        "student_small", VOCAB, VOCAB, hidden=128, embed_dim=64, dropout=0.0,
        num_layers=2,
    )
    src = jax.random.randint(jax.random.PRNGKey(3), (4, 6), 4, VOCAB)
    sl = jnp.full((4,), 6, jnp.int32)
    v = m.init(jax.random.PRNGKey(0), src, sl, jnp.ones((4, 2), jnp.int32))
    dec = pack_decoder(
        v["params"], m.cfg, 8, compute_dtype=jnp.float32, use_pallas=False
    )
    return m, v, src, sl, dec


class TestShardedGenerator:
    def test_padded_pack_alignment(self, setup):
        m, v, *_ = setup
        gen = pack_generator_sharded(
            v["params"]["generator"]["kernel"],
            v["params"]["generator"]["bias"],
            8, mp=4, max_group=2,
        )
        # width padded to mp * group * 256 and bias tail is the -1e9 mask
        assert gen.shape[1] % (4 * 2 * 256) == 0
        assert float(gen.bias[-1]) == -1e9
        assert float(gen.bias[VOCAB - 1]) != -1e9

    @pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4), (8, 1), (1, 8)])
    def test_sharded_step_matches_local(self, setup, mesh_shape):
        from quantized_distillation_tpu.serve.infer import (
            encode_packed,
            packed_decode_step_topk,
        )

        m, v, src, sl, dec = setup
        mesh = make_mesh(*mesh_shape)
        sdec = shard_decoder(
            dec, mesh,
            v["params"]["generator"]["kernel"],
            v["params"]["generator"]["bias"],
        )
        k = 4
        keys, enc_out, enc_mask, st = encode_packed(m, v, dec, src, sl)
        rep = lambda t: jnp.repeat(t, k, axis=0)
        st_b = jax.tree.map(rep, st)
        tok = jnp.ones((src.shape[0] * k,), jnp.int32)

        _, (v1, i1, l1) = packed_decode_step_topk(
            dec, st_b, tok, rep(keys), rep(enc_out), rep(enc_mask), k
        )
        step = make_sharded_decode_step_topk(sdec, mesh, k)
        _, (v2, i2, l2) = step(st_b, tok, rep(keys), rep(enc_out), rep(enc_mask))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-4)

    def test_sharded_beam_matches_single_device(self, setup):
        m, v, src, sl, dec = setup
        mesh = make_mesh(2, 4)
        sdec = shard_decoder(
            dec, mesh,
            v["params"]["generator"]["kernel"],
            v["params"]["generator"]["bias"],
        )
        cfg = BeamConfig(beam_size=3, max_len=8)
        t1, s1 = beam_search_packed(m, v, dec, src, sl, cfg, fused_topk=True)
        t2, s2 = beam_search_sharded(m, v, sdec, src, sl, cfg, mesh)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-4)

    def test_sharded_coverage_and_attention_match_single_device(self, setup):
        # round-5: coverage penalty + per-hypothesis attention flow through
        # the sharded step (with_align) identically to the packed path
        m, v, src, sl, dec = setup
        mesh = make_mesh(2, 4)
        sdec = shard_decoder(
            dec, mesh,
            v["params"]["generator"]["kernel"],
            v["params"]["generator"]["bias"],
        )
        cfg = BeamConfig(beam_size=3, max_len=8, coverage_penalty=0.4)
        t1, s1, a1 = beam_search_packed(
            m, v, dec, src, sl, cfg, fused_topk=True, return_attention=True
        )
        t2, s2, a2 = beam_search_sharded(
            m, v, sdec, src, sl, cfg, mesh, return_attention=True
        )
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-4)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-5)

    def test_shard_decoder_preserves_store8_quantization(self, setup):
        """shard_decoder must repack a byte-stored (store_bits=8) decoder at
        its TRUE quant bits — reusing the container bits would silently
        re-quantize the generator at 8 bits (the quant_bits plumbing)."""
        m, v, src, sl, _ = setup
        dec4 = pack_decoder(
            v["params"], m.cfg, 4, compute_dtype=jnp.float32,
            use_pallas=False, generator_store_bits=8,
        )
        assert dec4.generator.bits == 8
        assert dec4.generator.effective_quant_bits == 4
        mesh = make_mesh(2, 4)
        sdec = shard_decoder(
            dec4, mesh,
            v["params"]["generator"]["kernel"],
            v["params"]["generator"]["bias"],
        )
        assert sdec.generator.effective_quant_bits == 4
        assert sdec.generator.bits == 8
        cfg = BeamConfig(beam_size=3, max_len=8)
        t1, s1 = beam_search_packed(m, v, dec4, src, sl, cfg, fused_topk=True)
        t2, s2 = beam_search_sharded(m, v, sdec, src, sl, cfg, mesh)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-4)

    def test_rejects_indivisible_batch(self, setup):
        m, v, src, sl, dec = setup
        mesh = make_mesh(8, 1)
        sdec = shard_decoder(
            dec, mesh,
            v["params"]["generator"]["kernel"],
            v["params"]["generator"]["bias"],
        )
        with pytest.raises(ValueError):
            beam_search_sharded(
                m, v, sdec, src[:3], sl[:3], BeamConfig(beam_size=2, max_len=4), mesh
            )


class TestShardedEngine:
    def test_continuous_batching_on_mesh_matches_offline(self, setup):
        from quantized_distillation_tpu.config import ServeConfig
        from quantized_distillation_tpu.serve.engine import TranslationEngine

        m, v, src, sl, dec = setup
        mesh = make_mesh(4, 2)
        sdec = shard_decoder(
            dec, mesh,
            v["params"]["generator"]["kernel"],
            v["params"]["generator"]["bias"],
        )
        cfg = ServeConfig(
            max_slots=4,
            max_src_len=6,
            max_tgt_len=8,
            beam=BeamConfig(beam_size=3, max_len=8),
        )
        eng = TranslationEngine(m, v, cfg, packed_decoder=sdec, mesh=mesh)
        sents = [list(np.asarray(src[i][: int(sl[i])])) for i in range(4)] * 2
        rids = [eng.submit(s) for s in sents]
        done = eng.run_until_drained()
        assert sorted(c.request_id for c in done) == sorted(rids)
        # oracle: offline sharded beam on the same sentences
        t_ref, _ = beam_search_sharded(
            m, v, sdec, src, sl, cfg.beam, mesh
        )
        by_rid = {c.request_id: c.tokens for c in done}
        for i in range(4):
            np.testing.assert_array_equal(by_rid[rids[i]], np.asarray(t_ref[i]))
            np.testing.assert_array_equal(by_rid[rids[i + 4]], np.asarray(t_ref[i]))

    def test_engine_rejects_bad_slot_count(self, setup):
        from quantized_distillation_tpu.config import ServeConfig
        from quantized_distillation_tpu.serve.engine import TranslationEngine

        m, v, src, sl, dec = setup
        mesh = make_mesh(8, 1)
        with pytest.raises(ValueError):
            TranslationEngine(
                m, v,
                ServeConfig(max_slots=3, max_src_len=6, max_tgt_len=8,
                            beam=BeamConfig(beam_size=2, max_len=8)),
                packed_decoder=dec, mesh=mesh,
            )
