"""Pallas kernel tests: interpret mode vs the jnp golden path
(SURVEY.md §4 item 2 — tolerance ~0 for integer paths)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_distillation_tpu.kernels import (
    dequant_matmul,
    dequant_matmul_reference,
    dequantize_linear,
    pack_linear,
    plane_unpack,
)
from quantized_distillation_tpu.kernels.packed import _plane_pack
from quantized_distillation_tpu.ops import uniform

BITS = [2, 4, 8]


class TestPlanePacking:
    @pytest.mark.parametrize("bits", BITS)
    def test_roundtrip_exact(self, rng, bits):
        levels = jnp.asarray(rng.integers(0, 2**bits, (16, 512)), jnp.int32)
        packed = _plane_pack(levels, bits)
        assert packed.dtype == jnp.uint8
        assert packed.shape == (16, 512 * bits // 8)
        np.testing.assert_array_equal(np.asarray(plane_unpack(packed, bits)), levels)

    @pytest.mark.parametrize("bits", BITS)
    def test_pack_linear_matches_ops_fake_quant(self, rng, bits):
        # deployment dequant == training fake-quant (same bucket math) when
        # N is a multiple of the bucket-group width
        w = jnp.asarray(rng.standard_normal((32, 512)).astype(np.float32))
        p = pack_linear(w, bits)
        got = dequantize_linear(p)
        want = uniform.fake_quant(w, bits)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)

    def test_codebook_pack_roundtrip(self, rng):
        w = jnp.asarray(rng.standard_normal((8, 256)).astype(np.float32))
        pts = jnp.asarray(np.sort(rng.uniform(0, 1, 16)).astype(np.float32))
        p = pack_linear(w, 4, points=pts)
        from quantized_distillation_tpu.ops import codebook as cb

        want = cb.fake_quant(w, pts)
        np.testing.assert_allclose(
            np.asarray(dequantize_linear(p)), np.asarray(want), atol=2e-6
        )

    def test_rejects_non_matrix(self):
        with pytest.raises(ValueError):
            pack_linear(jnp.zeros((2, 3, 4)), 4)


class TestDequantMatmulInterpret:
    @pytest.mark.parametrize("bits", BITS)
    def test_uniform_matches_reference(self, rng, bits):
        w = jnp.asarray(rng.standard_normal((64, 512)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((24, 64)).astype(np.float32))
        p = pack_linear(w, bits)
        ref = dequant_matmul_reference(x, p)
        pal = dequant_matmul(x, p, compute_dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(
            np.asarray(pal), np.asarray(ref), rtol=1e-4, atol=1e-4
        )

    @pytest.mark.parametrize("bits", [2, 4])
    def test_codebook_matches_reference(self, rng, bits):
        w = jnp.asarray(rng.standard_normal((64, 512)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((24, 64)).astype(np.float32))
        pts = jnp.asarray(np.sort(rng.uniform(0, 1, 2**bits)).astype(np.float32))
        p = pack_linear(w, bits, points=pts)
        ref = dequant_matmul_reference(x, p)
        pal = dequant_matmul(x, p, compute_dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(
            np.asarray(pal), np.asarray(ref), rtol=1e-4, atol=1e-4
        )

    def test_ragged_n_with_bias(self, rng):
        w = jnp.asarray(rng.standard_normal((64, 300)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((8, 64)).astype(np.float32))
        bias = jnp.arange(300, dtype=jnp.float32)
        p = pack_linear(w, 4, bias=bias)
        ref = dequant_matmul_reference(x, p)
        pal = dequant_matmul(x, p, compute_dtype=jnp.float32, interpret=True)
        assert pal.shape == (8, 300)
        np.testing.assert_allclose(
            np.asarray(pal), np.asarray(ref), rtol=1e-4, atol=1e-4
        )

    def test_odd_m_padding(self, rng):
        w = jnp.asarray(rng.standard_normal((64, 256)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((5, 64)).astype(np.float32))
        p = pack_linear(w, 4)
        pal = dequant_matmul(x, p, compute_dtype=jnp.float32, interpret=True)
        assert pal.shape == (5, 256)
        np.testing.assert_allclose(
            np.asarray(pal),
            np.asarray(dequant_matmul_reference(x, p)),
            rtol=1e-4,
            atol=1e-4,
        )

    @pytest.mark.parametrize("bits", [2, 4, 8])
    def test_k_tiled_matches_reference_at_k4096(self, rng, bits):
        """VERDICT #8: K beyond the VMEM slab budget runs the reduction-grid
        path (auto k_tile 2048) and must stay exact."""
        w = jnp.asarray(rng.standard_normal((4096, 512)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((8, 4096)).astype(np.float32))
        p = pack_linear(w, bits)
        ref = dequant_matmul_reference(x, p)
        from quantized_distillation_tpu.kernels.dequant_matmul import pick_k_tile
        assert pick_k_tile(4096, None) == 2048  # auto-tiling engages
        pal = dequant_matmul(x, p, compute_dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(
            np.asarray(pal), np.asarray(ref), rtol=2e-4, atol=2e-4
        )

    def test_explicit_k_tile_matches_untiled(self, rng):
        w = jnp.asarray(rng.standard_normal((256, 512)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((8, 256)).astype(np.float32))
        p = pack_linear(w, 4)
        untiled = dequant_matmul(x, p, compute_dtype=jnp.float32, interpret=True)
        tiled = dequant_matmul(
            x, p, compute_dtype=jnp.float32, interpret=True, k_tile=64
        )
        # tiled reduction sums in a different order: f32 noise only
        np.testing.assert_allclose(
            np.asarray(tiled), np.asarray(untiled), rtol=1e-3, atol=2e-4
        )

    def test_codebook_k_tiled(self, rng):
        w = jnp.asarray(rng.standard_normal((512, 512)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((4, 512)).astype(np.float32))
        pts = jnp.asarray(np.sort(rng.uniform(0, 1, 16)).astype(np.float32))
        p = pack_linear(w, 4, points=pts)
        ref = dequant_matmul_reference(x, p)
        pal = dequant_matmul(
            x, p, compute_dtype=jnp.float32, interpret=True, k_tile=128
        )
        np.testing.assert_allclose(
            np.asarray(pal), np.asarray(ref), rtol=2e-4, atol=2e-4
        )

    def test_bad_k_tile_raises(self, rng):
        p = pack_linear(jnp.zeros((64, 256)), 4)
        with pytest.raises(ValueError):
            dequant_matmul(jnp.zeros((4, 64)), p, interpret=True, k_tile=48)

    def test_k_mismatch_raises(self, rng):
        p = pack_linear(jnp.zeros((64, 256)), 4)
        with pytest.raises(ValueError):
            dequant_matmul(jnp.zeros((4, 32)), p, interpret=True)

    def test_fallback_path(self, rng):
        w = jnp.asarray(rng.standard_normal((64, 256)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
        p = pack_linear(w, 4)
        out = dequant_matmul(x, p, use_pallas=False, compute_dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(out),
            np.asarray(dequant_matmul_reference(x, p)),
            rtol=1e-4,
            atol=1e-5,
        )


class TestFusedTopK:
    """Fused dequant+matmul+top-k+lse kernel (interpret mode) vs exact
    reference. Random weights put the top-k in distinct lane classes with
    overwhelming probability, so results should match exactly here."""

    @pytest.mark.parametrize("bits", BITS)
    def test_matches_reference(self, rng, bits):
        from quantized_distillation_tpu.kernels import (
            dequant_matmul_topk,
            dequant_matmul_topk_reference,
        )

        w = jnp.asarray(rng.standard_normal((64, 1024)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((9, 64)).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal(1024).astype(np.float32))
        p = pack_linear(w, bits, bias=bias)
        v, i, lse = dequant_matmul_topk(
            x, p, 5, compute_dtype=jnp.float32, interpret=True
        )
        vr, ir, lser = dequant_matmul_topk_reference(x, p, 5)
        assert v.shape == (9, 5) and i.shape == (9, 5) and lse.shape == (9, 1)
        np.testing.assert_allclose(np.asarray(v), np.asarray(vr), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ir))
        np.testing.assert_allclose(np.asarray(lse), np.asarray(lser), atol=1e-4)

    @pytest.mark.parametrize("group", [2, 8])
    def test_group_sizes_match_reference(self, rng, group):
        """Smaller bucket groups (large-batch serving VMEM relief, see
        serve.infer.pack_decoder generator_group) stay exact."""
        from quantized_distillation_tpu.kernels import (
            dequant_matmul_topk,
            dequant_matmul_topk_reference,
        )

        w = jnp.asarray(rng.standard_normal((64, 4096)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((5, 64)).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal(4096).astype(np.float32))
        p = pack_linear(w, 4, bias=bias, max_group=group)
        assert p.group == group
        v, i, lse = dequant_matmul_topk(
            x, p, 5, compute_dtype=jnp.float32, interpret=True
        )
        vr, ir, lser = dequant_matmul_topk_reference(x, p, 5)
        np.testing.assert_allclose(np.asarray(v), np.asarray(vr), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ir))
        np.testing.assert_allclose(np.asarray(lse), np.asarray(lser), atol=1e-4)

    def test_codebook_matches_reference(self, rng):
        from quantized_distillation_tpu.kernels import (
            dequant_matmul_topk,
            dequant_matmul_topk_reference,
        )

        w = jnp.asarray(rng.standard_normal((32, 512)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32))
        pts = jnp.asarray(np.sort(rng.uniform(0, 1, 16)).astype(np.float32))
        p = pack_linear(w, 4, points=pts, lut_mode="exact")
        v, i, lse = dequant_matmul_topk(
            x, p, 4, compute_dtype=jnp.float32, interpret=True
        )
        vr, ir, lser = dequant_matmul_topk_reference(x, p, 4)
        np.testing.assert_allclose(np.asarray(v), np.asarray(vr), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ir))
        np.testing.assert_allclose(np.asarray(lse), np.asarray(lser), atol=1e-4)

    def test_unpadded_tail_masked(self, rng):
        """N not a multiple of the bucket-group width: edge-padded duplicate
        columns must not appear in top-k indices nor inflate the lse."""
        from quantized_distillation_tpu.kernels import (
            dequant_matmul_topk,
            dequant_matmul_topk_reference,
        )

        n = 700  # pads to 1024 with bg=4? (group chosen by pack_linear)
        w = jnp.asarray(rng.standard_normal((16, n)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((3, 16)).astype(np.float32))
        p = pack_linear(w, 4)
        v, i, lse = dequant_matmul_topk(
            x, p, 5, compute_dtype=jnp.float32, interpret=True
        )
        vr, ir, lser = dequant_matmul_topk_reference(x, p, 5)
        assert int(jnp.max(i)) < n
        np.testing.assert_allclose(np.asarray(v), np.asarray(vr), atol=1e-4)
        np.testing.assert_allclose(np.asarray(lse), np.asarray(lser), atol=1e-4)

    @pytest.mark.parametrize("slots", [2, 4, 8])
    def test_slots_match_reference_random(self, rng, slots):
        from quantized_distillation_tpu.kernels import (
            dequant_matmul_topk,
            dequant_matmul_topk_reference,
        )

        w = jnp.asarray(rng.standard_normal((32, 1024)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((6, 32)).astype(np.float32))
        p = pack_linear(w, 4)
        v, i, lse, cert = dequant_matmul_topk(
            x, p, 5, compute_dtype=jnp.float32, interpret=True,
            slots=slots, certify=True,
        )
        vr, ir, lser = dequant_matmul_topk_reference(x, p, 5)
        np.testing.assert_allclose(np.asarray(v), np.asarray(vr), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ir))
        # random logits: every row certified exact
        assert np.asarray(cert).all()

    def test_adversarial_lane_collision_detected_and_fixed(self, rng):
        """>= 3 of the true top-5 in ONE lane class: slots=2 must FLAG the
        rows (certificate 0) and slots=8 (= beam-width-proof) must be exact
        AND certified (VERDICT round-1 item 1)."""
        from quantized_distillation_tpu.kernels import (
            dequant_matmul_topk,
            dequant_matmul_topk_reference,
        )

        n = 1024
        w = jnp.asarray(0.01 * rng.standard_normal((32, n)).astype(np.float32))
        x = jnp.asarray(0.01 * rng.standard_normal((4, 32)).astype(np.float32))
        bias = np.zeros(n, np.float32)
        bias[0], bias[128], bias[256] = 10.0, 9.0, 8.0  # all lane class 0
        p = pack_linear(w, 8, bias=jnp.asarray(bias))
        vr, ir, lser = dequant_matmul_topk_reference(x, p, 5)
        assert set(np.asarray(ir[0, :3])) == {0, 128, 256}  # setup sanity
        v2, i2, _, c2 = dequant_matmul_topk(
            x, p, 5, compute_dtype=jnp.float32, interpret=True,
            slots=2, certify=True,
        )
        assert not np.asarray(c2).any()  # every row flagged as possibly inexact
        assert not (np.asarray(i2) == np.asarray(ir)).all()  # and indeed wrong
        v8, i8, lse8, c8 = dequant_matmul_topk(
            x, p, 5, compute_dtype=jnp.float32, interpret=True,
            slots=8, certify=True,
        )
        assert np.asarray(c8).all()
        np.testing.assert_array_equal(np.asarray(i8), np.asarray(ir))
        np.testing.assert_allclose(np.asarray(v8), np.asarray(vr), atol=1e-4)
        np.testing.assert_allclose(np.asarray(lse8), np.asarray(lser), atol=1e-4)

    @pytest.mark.parametrize("lse_shift", [False, True])
    def test_latency_knobs_match_reference(self, rng, lse_shift):
        """The fixed-shift lse is a pure latency optimization: selection
        results and the lse must stay exact on random (collision-free)
        inputs, certificates included. (A round-4 `streams` knob measured
        slower everywhere and was deleted — BASELINE.md round 4.)"""
        from quantized_distillation_tpu.kernels import (
            dequant_matmul_topk,
            dequant_matmul_topk_reference,
        )

        w = jnp.asarray(rng.standard_normal((32, 2048)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((6, 32)).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal(2048).astype(np.float32))
        p = pack_linear(w, 4, bias=bias)
        v, i, lse, cert = dequant_matmul_topk(
            x, p, 5, compute_dtype=jnp.float32, interpret=True,
            lse_shift=lse_shift, certify=True,
        )
        vr, ir, lser = dequant_matmul_topk_reference(x, p, 5)
        np.testing.assert_allclose(np.asarray(v), np.asarray(vr), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ir))
        np.testing.assert_allclose(np.asarray(lse), np.asarray(lser), atol=1e-4)
        assert np.asarray(cert).all()

    def test_pair_select_matches_reference(self, rng):
        """Bucket-pair select (round-5 stream thinning): exact selection,
        indices, fixed-shift lse, and certificate on random inputs."""
        from quantized_distillation_tpu.kernels import (
            dequant_matmul_topk,
            dequant_matmul_topk_reference,
        )

        w = jnp.asarray(rng.standard_normal((32, 2048)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((6, 32)).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal(2048).astype(np.float32))
        p = pack_linear(w, 4, bias=bias)
        v, i, lse, cert = dequant_matmul_topk(
            x, p, 5, compute_dtype=jnp.float32, interpret=True,
            pair=True, certify=True,
        )
        vr, ir, lser = dequant_matmul_topk_reference(x, p, 5)
        np.testing.assert_allclose(np.asarray(v), np.asarray(vr), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ir))
        np.testing.assert_allclose(np.asarray(lse), np.asarray(lser), atol=1e-4)
        assert np.asarray(cert).all()

    def test_pair_same_bucket_lane_collision_certified(self, rng):
        """pair adds a failure mode: two top-k values in the SAME bucket's
        two chunks at the SAME lane — the pairwise max drops one before the
        survivor set even sees it. The certificate must flag it (the
        pairwise loser feeds the discard bound), and the row max must stay
        exact (greedy unaffected)."""
        from quantized_distillation_tpu.kernels import (
            dequant_matmul_topk,
            dequant_matmul_topk_reference,
        )

        n = 1024
        w = jnp.asarray(0.01 * rng.standard_normal((32, n)).astype(np.float32))
        x = jnp.asarray(0.01 * rng.standard_normal((4, 32)).astype(np.float32))
        bias = np.zeros(n, np.float32)
        # columns 64 and 192 are lane 64 of chunks 0 and 1 of BUCKET 0:
        # the pairwise max keeps only one of the two planted values
        bias[64] = 10.0
        bias[192] = 9.5
        for rank, col in enumerate((300, 429, 558)):  # fill the rest of top-5
            bias[col] = 8.0 - rank
        p = pack_linear(w, 8, bias=jnp.asarray(bias))
        vr, ir, lser = dequant_matmul_topk_reference(x, p, 5)
        v, i, lse, cert = dequant_matmul_topk(
            x, p, 5, compute_dtype=jnp.float32, interpret=True,
            pair=True, certify=True,
        )
        # every row must be FLAGGED as possibly inexact...
        assert not np.asarray(cert).any()
        # ...and indeed misses the same-bucket-lane runner-up
        assert not (np.asarray(i) == np.asarray(ir)).all()
        # greedy (row max) stays exact
        np.testing.assert_array_equal(
            np.asarray(i)[:, 0], np.asarray(ir)[:, 0]
        )
        # the lse is exact regardless (every value is summed)
        np.testing.assert_allclose(np.asarray(lse), np.asarray(lser), atol=1e-4)
        # the non-pair path keeps both (different chunks -> separate
        # survivor updates; slots=2 holds two per lane class) and certifies
        v2, i2, _, c2 = dequant_matmul_topk(
            x, p, 5, compute_dtype=jnp.float32, interpret=True, certify=True,
        )
        np.testing.assert_array_equal(np.asarray(i2), np.asarray(ir))
        assert np.asarray(c2).all()

    def test_probe_modes_compile_and_are_marked_garbage(self, rng):
        """The decomposition probe modes must build and run (they exist to
        be timed on hardware); their outputs are garbage by contract, so
        only shapes are checked."""
        from quantized_distillation_tpu.kernels import dequant_matmul_topk

        w = jnp.asarray(rng.standard_normal((32, 1024)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((6, 32)).astype(np.float32))
        p = pack_linear(w, 4)
        for mode in ("noselect", "nodots"):
            v, i, lse = dequant_matmul_topk(
                x, p, 5, compute_dtype=jnp.float32, interpret=True, probe=mode
            )
            assert v.shape == (6, 5) and i.shape == (6, 5)

    def test_store8_bit_exact_and_kernel_parity(self, rng):
        """store_bits=8: same 4-bit quantization DECISIONS, one level per
        byte — dense dequant is bit-identical and the fused kernel output
        matches the sub-byte container's."""
        from quantized_distillation_tpu.kernels import (
            dequant_matmul_topk,
            dequant_matmul_topk_reference,
        )
        from quantized_distillation_tpu.kernels.packed import dequantize_linear

        w = jnp.asarray(rng.standard_normal((32, 1024)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((5, 32)).astype(np.float32))
        p4 = pack_linear(w, 4)
        p8 = pack_linear(w, 4, store_bits=8)
        assert p8.bits == 8 and p8.packed.shape[1] == 2 * p4.packed.shape[1]
        np.testing.assert_array_equal(
            np.asarray(dequantize_linear(p8)), np.asarray(dequantize_linear(p4))
        )
        v, i, lse = dequant_matmul_topk(
            x, p8, 5, compute_dtype=jnp.float32, interpret=True
        )
        vr, ir, lser = dequant_matmul_topk_reference(x, p4, 5)
        np.testing.assert_allclose(np.asarray(v), np.asarray(vr), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ir))
        np.testing.assert_allclose(np.asarray(lse), np.asarray(lser), atol=1e-4)

    def test_bf16_select_stream(self, rng):
        """select_dtype=bf16: indices may differ only on within-bf16-ulp
        ties; top-k VALUES stay within bf16 noise of the exact reference,
        the lse stays f32-accurate, and it requires lse_shift."""
        from quantized_distillation_tpu.kernels import (
            dequant_matmul_topk,
            dequant_matmul_topk_reference,
        )

        w = jnp.asarray(rng.standard_normal((32, 2048)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((6, 32)).astype(np.float32))
        p = pack_linear(w, 4)
        v, i, lse = dequant_matmul_topk(
            x, p, 5, compute_dtype=jnp.float32, interpret=True,
            lse_shift=True, select_dtype=jnp.bfloat16,
        )
        vr, ir, lser = dequant_matmul_topk_reference(x, p, 5)
        scale = float(np.abs(np.asarray(vr)).max())
        noise = 2.0 ** -8 * max(scale, 1.0)
        np.testing.assert_allclose(
            np.sort(np.asarray(v), axis=1), np.sort(np.asarray(vr), axis=1),
            rtol=0, atol=noise,
        )
        np.testing.assert_allclose(
            np.asarray(lse), np.asarray(lser), rtol=0, atol=1e-3
        )
        # gaussian logits: bf16 ties in the top-5 are overwhelmingly absent
        assert (np.asarray(i) == np.asarray(ir)).mean() > 0.9
        with pytest.raises(ValueError):
            dequant_matmul_topk(
                x, p, 5, interpret=True, select_dtype=jnp.bfloat16
            )

    def test_store8_rejects_codebook(self, rng):
        w = jnp.asarray(rng.standard_normal((16, 256)).astype(np.float32))
        pts = jnp.linspace(0.0, 1.0, 16)
        with pytest.raises(ValueError):
            pack_linear(w, 4, points=pts, store_bits=8)

    def test_rejects_k_too_large(self, rng):
        from quantized_distillation_tpu.kernels import dequant_matmul_topk

        w = jnp.asarray(rng.standard_normal((16, 256)).astype(np.float32))
        p = pack_linear(w, 4)
        with pytest.raises(ValueError):
            dequant_matmul_topk(jnp.ones((2, 16)), p, 9, interpret=True)

    def test_reference_fallback_on_cpu(self, rng):
        from quantized_distillation_tpu.kernels import (
            dequant_matmul_topk,
            dequant_matmul_topk_reference,
        )

        w = jnp.asarray(rng.standard_normal((16, 512)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
        p = pack_linear(w, 2)
        got = dequant_matmul_topk(
            x, p, 3, use_pallas=False, compute_dtype=jnp.float32
        )
        want = dequant_matmul_topk_reference(x, p, 3)
        for g, wv in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(wv), atol=1e-5)


class TestFakeQuantKernel:
    """Single-pass fused fake-quant (kernels/fake_quant.py) must compute the
    same quantization as the jnp bucketing pipeline it replaces inside the
    STE train step — same levels, dequant values to 1 ulp (fma ordering may
    differ between the pallas and XLA lowerings)."""

    @pytest.mark.parametrize("bits", [2, 4, 8])
    @pytest.mark.parametrize("scaling", ["linear", "absmax"])
    def test_matches_jnp_path(self, rng, bits, scaling):
        from quantized_distillation_tpu.kernels.fake_quant import (
            fake_quant_buckets_pallas,
        )
        from quantized_distillation_tpu.ops import uniform
        from quantized_distillation_tpu.ops.bucketing import to_buckets

        x = jnp.asarray(rng.standard_normal((37, 129)).astype(np.float32))
        want = uniform.fake_quant(
            x, bits, scaling=scaling, use_pallas=False
        )
        buckets, n = to_buckets(x, 256)
        got_b = fake_quant_buckets_pallas(
            buckets, bits, scaling=scaling, row_tile=8, interpret=True
        )
        got = got_b.reshape(-1)[:n].reshape(x.shape)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=0, atol=2e-6
        )
        # the grid LEVELS must agree exactly: value diffs are dequant fma
        # ordering only, never a different quantization decision
        def levels(v):
            q = uniform.quantize(v, bits, scaling=scaling)
            return np.asarray(q.levels)

        np.testing.assert_array_equal(levels(got), levels(want))

    def test_degenerate_constant_bucket(self, rng):
        from quantized_distillation_tpu.kernels.fake_quant import (
            fake_quant_buckets_pallas,
        )

        buckets = jnp.concatenate(
            [
                jnp.full((2, 256), 3.25, jnp.float32),  # constant bucket
                jnp.zeros((2, 256), jnp.float32),  # all-zero bucket
            ]
        )
        out = fake_quant_buckets_pallas(buckets, 4, interpret=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(buckets))

    def test_auto_dispatch_respects_flags(self, rng):
        # on CPU the auto path must stay jnp (no pallas compile), and the
        # explicit use_pallas=False path must keep working under stochastic
        from quantized_distillation_tpu.ops import uniform

        x = jnp.asarray(rng.standard_normal((16, 64)).astype(np.float32))
        a = uniform.fake_quant(x, 4)
        b = uniform.fake_quant(x, 4, use_pallas=False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_ste_grad_flows_through_pallas_path(self, rng):
        """jax.grad of a loss over ste_fake_quant with the pallas kernel on
        the value path must produce the straight-through (identity-masked)
        gradient — the kernel input is detached so linearization never needs
        a pallas JVP rule (the round-4 TPU train-bench failure mode)."""
        from quantized_distillation_tpu.ops import uniform

        x = jnp.asarray(rng.standard_normal((600,)).astype(np.float32))

        def loss(v, use_pallas):
            q = uniform.ste_fake_quant(v, 4, use_pallas=use_pallas)
            return jnp.sum(jnp.sin(q))

        g_pallas = jax.grad(lambda v: loss(v, True))(x)
        g_jnp = jax.grad(lambda v: loss(v, False))(x)
        np.testing.assert_allclose(
            np.asarray(g_pallas), np.asarray(g_jnp), rtol=0, atol=1e-5
        )


class TestCrossKernelNumerics:
    def test_fused_vs_plain_topk_values_within_bf16_noise(self, rng):
        """Round-3 finding, codified: the fused kernel folds the bucket
        affine into bf16 WEIGHTS while the plain kernel folds it into bf16
        activations, so top-k index sets may differ on near-degenerate
        logits — but the top-k VALUES must agree within cross-kernel bf16
        noise (the basis for the serving-vocab divergence study's soundness
        bound, BASELINE.md)."""
        from quantized_distillation_tpu.kernels.topk_fused import (
            dequant_matmul_topk,
        )

        w = jnp.asarray(rng.standard_normal((256, 2048)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((16, 256)).astype(np.float32))
        p = pack_linear(w, 4)
        v_fused, _, lse_fused = dequant_matmul_topk(
            x, p, 5, compute_dtype=jnp.bfloat16, interpret=True
        )
        logits = dequant_matmul(
            x, p, compute_dtype=jnp.bfloat16, interpret=True
        )
        v_plain, _ = jax.lax.top_k(logits, 5)
        lse_plain = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
        scale = np.abs(np.asarray(logits)).max()
        noise = 4 * 2.0**-8 * max(scale, 1.0)  # a few bf16 ulps at |logit|
        np.testing.assert_allclose(
            np.sort(np.asarray(v_fused), axis=1),
            np.sort(np.asarray(v_plain), axis=1),
            atol=noise,
        )
        np.testing.assert_allclose(
            np.asarray(lse_fused), np.asarray(lse_plain), atol=noise
        )


class TestBeamCombineKernel:
    """One-launch fused beam combine (kernels/beam_combine.py): must be
    bit-identical to lax.top_k + take_along_axis including tie order
    (finished beams produce blocks of equal NEG_INF candidates)."""

    def test_matches_lax_topk_with_ties(self):
        from quantized_distillation_tpu.kernels.beam_combine import (
            beam_combine_topk,
        )

        rng = np.random.default_rng(11)
        for _ in range(25):
            cand = rng.standard_normal((16, 25)).astype(np.float32) * 10
            cand[rng.random((16, 25)) < 0.35] = -1e9
            tok = rng.integers(0, 32000, (16, 25)).astype(np.int32)
            v0, p0 = jax.lax.top_k(jnp.asarray(cand), 5)
            t0 = jnp.take_along_axis(jnp.asarray(tok), p0, axis=1)
            v1, p1, t1 = beam_combine_topk(
                jnp.asarray(cand), jnp.asarray(tok), 5, interpret=True
            )
            np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
            np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
            np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))

    def test_wide_candidate_fallback(self):
        from quantized_distillation_tpu.kernels.beam_combine import (
            beam_combine_topk,
        )

        # n > 128 lanes falls back to lax.top_k (identical semantics)
        rng = np.random.default_rng(2)
        cand = jnp.asarray(rng.standard_normal((4, 200)).astype(np.float32))
        tok = jnp.asarray(rng.integers(0, 99, (4, 200)).astype(np.int32))
        v0, p0 = jax.lax.top_k(cand, 7)
        v1, p1, t1 = beam_combine_topk(cand, tok, 7, interpret=True)
        np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
        np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
