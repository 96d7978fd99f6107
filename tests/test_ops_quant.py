"""Property + oracle tests for the quantization core (SURVEY.md §4 item 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_distillation_tpu.ops import bucketing, codebook, huffman, packing, uniform
from tests.oracle import (
    oracle_codebook_fake_quant,
    oracle_pack_unpack,
    oracle_uniform_fake_quant,
)

SHAPES = [(1000,), (37,), (256,), (16, 129), (3, 3, 7, 11)]
BITS = [2, 4, 8]
SCALINGS = ["linear", "absmax"]


def _rand(rng, shape, scale=3.0):
    return (rng.standard_normal(shape) * scale).astype(np.float32)


class TestBucketing:
    @pytest.mark.parametrize("shape", SHAPES)
    def test_roundtrip(self, rng, shape):
        x = _rand(rng, shape)
        b, n = bucketing.to_buckets(jnp.asarray(x), 256)
        assert b.shape[1] == 256
        back = bucketing.from_buckets(b, n, shape)
        np.testing.assert_array_equal(np.asarray(back), x)

    def test_edge_padding_preserves_stats(self, rng):
        # Tail bucket padded with edge value: min/max/absmax unchanged.
        x = _rand(rng, (300,))
        b, _ = bucketing.to_buckets(jnp.asarray(x), 256)
        tail = np.asarray(b[1])
        real_tail = x[256:]
        assert tail.min() == real_tail.min()
        assert tail.max() == real_tail.max()
        assert np.abs(tail).max() == np.abs(real_tail).max()

    @pytest.mark.parametrize("kind", SCALINGS)
    def test_scale_into_unit_interval(self, rng, kind):
        x = _rand(rng, (4, 256))
        b, _ = bucketing.to_buckets(jnp.asarray(x), 256)
        sp = bucketing.compute_scale(b, kind)
        s01 = np.asarray(bucketing.apply_scale(b, sp))
        assert s01.min() >= -1e-6 and s01.max() <= 1 + 1e-6
        back = np.asarray(bucketing.invert_scale(jnp.asarray(s01), sp))
        np.testing.assert_allclose(back, np.asarray(b), rtol=1e-4, atol=1e-5)

    def test_degenerate_bucket_finite(self):
        x = jnp.zeros((256,))
        for kind in SCALINGS:
            b, n = bucketing.to_buckets(x, 256)
            sp = bucketing.compute_scale(b, kind)
            out = bucketing.invert_scale(bucketing.apply_scale(b, sp), sp)
            assert np.isfinite(np.asarray(out)).all()
            np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)


class TestUniform:
    @pytest.mark.parametrize("shape", SHAPES)
    @pytest.mark.parametrize("bits", BITS)
    @pytest.mark.parametrize("scaling", SCALINGS)
    def test_matches_oracle(self, rng, shape, bits, scaling):
        x = _rand(rng, shape)
        got = np.asarray(uniform.fake_quant(jnp.asarray(x), bits, scaling=scaling))
        want = oracle_uniform_fake_quant(x, bits, scaling=scaling)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("bits", BITS)
    def test_idempotent(self, rng, bits):
        # quantizing an already-quantized tensor is a no-op
        x = _rand(rng, (512,))
        q1 = uniform.fake_quant(jnp.asarray(x), bits)
        q2 = uniform.fake_quant(q1, bits)
        np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("bits", BITS)
    def test_error_bound(self, rng, bits):
        # |deq - x| <= half a grid step per bucket (linear scaling)
        x = _rand(rng, (1024,))
        q = np.asarray(uniform.fake_quant(jnp.asarray(x), bits))
        s = 2**bits - 1
        for start in range(0, 1024, 256):
            b = x[start : start + 256]
            step = (b.max() - b.min()) / s
            err = np.abs(q[start : start + 256] - b)
            assert err.max() <= step / 2 + 1e-5

    def test_stochastic_unbiased(self):
        # E[stochastic quant] = x (the reference's stochastic rounding claim)
        x = jnp.full((256,), 0.37)
        x = x.at[0].set(0.0).at[1].set(1.0)  # pin bucket range to [0,1]
        keys = jax.random.split(jax.random.PRNGKey(0), 2000)
        qfn = jax.jit(
            jax.vmap(lambda k: uniform.fake_quant(x, 2, stochastic=True, key=k))
        )
        acc = float(np.asarray(qfn(keys))[:, 2].mean())
        assert abs(acc - 0.37) < 0.02

    def test_stochastic_requires_key(self):
        with pytest.raises(ValueError):
            uniform.fake_quant(jnp.ones((4,)), 4, stochastic=True)

    def test_ste_gradient_is_identity(self, rng):
        x = jnp.asarray(_rand(rng, (512,)))

        def loss(w):
            return jnp.sum(uniform.ste_fake_quant(w, 4) * 3.0)

        g = jax.grad(loss)(x)
        np.testing.assert_allclose(np.asarray(g), 3.0, rtol=1e-6)

    def test_values_on_grid(self, rng):
        # dequantized values lie on the per-bucket grid
        x = _rand(rng, (256,))
        qt = uniform.quantize(jnp.asarray(x), 4)
        levels = np.asarray(qt.levels)
        assert levels.min() >= 0 and levels.max() <= 15
        assert levels.dtype == np.int32


class TestCodebook:
    @pytest.mark.parametrize("bits", BITS)
    @pytest.mark.parametrize("scaling", SCALINGS)
    def test_matches_oracle(self, rng, bits, scaling):
        x = _rand(rng, (700,))
        pts = np.sort(rng.uniform(0, 1, 2**bits)).astype(np.float32)
        got = np.asarray(
            codebook.fake_quant(jnp.asarray(x), jnp.asarray(pts), scaling=scaling)
        )
        want = oracle_codebook_fake_quant(x, pts, scaling=scaling)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_unsorted_points(self, rng):
        # assignment must not require a sorted codebook
        x = _rand(rng, (512,))
        pts = rng.uniform(0, 1, 16).astype(np.float32)
        got = np.asarray(codebook.fake_quant(jnp.asarray(x), jnp.asarray(pts)))
        want = oracle_codebook_fake_quant(x, pts)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_uniform_init_matches_uniform_quant(self, rng):
        # codebook at the uniform grid == uniform quantizer
        x = _rand(rng, (512,))
        pts = codebook.init_points(4, "uniform")
        got = np.asarray(codebook.fake_quant(jnp.asarray(x), pts))
        want = np.asarray(uniform.fake_quant(jnp.asarray(x), 4))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_points_gradient_is_scatter_add(self):
        # d/dp_j loss = sum of (cotangent * bucket scale) over weights at p_j
        x = jnp.asarray([0.0, 1.0, 0.09, 0.9, 0.91, 0.5])  # bucket range [0,1]
        pts = jnp.asarray([0.0, 0.1, 0.5, 0.9])

        def loss(p):
            return jnp.sum(codebook.fake_quant(x, p, bucket_size=8))

        g = np.asarray(jax.grad(loss)(pts))
        # assignments: 0→p0, 1→p3(0.9 nearest to 1.0), 0.09→p1, 0.9→p3,
        # 0.91→p3, 0.5→p2; padding (2 edge copies of 0.5)→p2
        # bucket scale = 1, so grads count assignments (padding included in
        # sum over the padded bucket? no: from_buckets strips padding)
        np.testing.assert_allclose(g, [1.0, 1.0, 1.0, 3.0], atol=1e-6)

    def test_ste_weight_gradient_identity(self, rng):
        x = jnp.asarray(_rand(rng, (300,)))
        pts = codebook.init_points(4, "uniform")

        def loss(w):
            return jnp.sum(codebook.ste_fake_quant(w, pts) * 2.0)

        g = jax.grad(loss)(x)
        np.testing.assert_allclose(np.asarray(g), 2.0, rtol=1e-6)

    def test_quantile_init(self, rng):
        x01 = jnp.asarray(rng.uniform(0, 1, 10000).astype(np.float32))
        pts = codebook.init_points(4, "quantile", x01)
        assert pts.shape == (16,)
        # quantiles of U[0,1] ~ uniform grid
        np.testing.assert_allclose(
            np.asarray(pts), np.linspace(0, 1, 16), atol=0.05
        )


class TestPacking:
    @pytest.mark.parametrize("bits", BITS)
    def test_roundtrip_matches_oracle(self, rng, bits):
        levels = rng.integers(0, 2**bits, size=(4, 256))
        packed = packing.pack(jnp.asarray(levels, dtype=jnp.int32), bits)
        want_packed, want_unpacked = oracle_pack_unpack(levels, bits)
        assert packed.dtype == jnp.uint8
        assert packed.shape == (4, 256 * bits // 8)
        np.testing.assert_array_equal(
            np.asarray(packed).reshape(-1), want_packed
        )
        unpacked = packing.unpack(packed, bits)
        np.testing.assert_array_equal(np.asarray(unpacked), levels)
        np.testing.assert_array_equal(np.asarray(unpacked), want_unpacked)

    def test_bad_shape_raises(self):
        with pytest.raises(ValueError):
            packing.pack(jnp.zeros((3,), jnp.int32), 4)  # 3 not multiple of 2


class TestHuffman:
    def test_uniform_distribution_full_bits(self, rng):
        idx = rng.integers(0, 16, size=100000)
        mb = huffman.mean_bits_per_symbol(idx)
        ent = huffman.entropy_bits_per_symbol(idx)
        assert ent <= mb <= ent + 1  # Huffman optimality band
        assert 3.9 < mb <= 4.01

    def test_skewed_distribution_compresses(self, rng):
        idx = rng.choice(16, size=100000, p=[0.85] + [0.01] * 15)
        mb = huffman.mean_bits_per_symbol(idx)
        ent = huffman.entropy_bits_per_symbol(idx)
        assert mb < 2.0
        assert ent <= mb <= ent + 1

    def test_single_symbol(self):
        assert huffman.mean_bits_per_symbol(np.zeros(100, np.int32)) == 1.0

    def test_empty(self):
        assert huffman.mean_bits_per_symbol(np.zeros(0, np.int32)) == 0.0

    def test_kraft_inequality(self, rng):
        idx = rng.integers(0, 11, size=5000)
        from collections import Counter

        lengths = huffman.code_lengths(dict(Counter(idx.tolist())))
        assert sum(2 ** -l for l in lengths.values()) <= 1.0 + 1e-12
