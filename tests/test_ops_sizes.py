"""Tests for compressed-size accounting (reference: helpers/functions.py)."""

import numpy as np

from quantized_distillation_tpu.ops.sizes import model_size_report


class TestSizeReport:
    def test_basic_4bit_ratio(self):
        # Large model, 4-bit, linear scaling: ratio approaches
        # 32 / (4 + 2*32/256) = 32/4.25 ≈ 7.53 — the paper's ~7.5x at 4-bit.
        rep = model_size_report({"w": 256 * 10000}, 4)
        assert abs(rep.compression_ratio - 32 / 4.25) < 1e-6

    def test_2bit_ratio(self):
        rep = model_size_report({"w": 256 * 10000}, 2, scaling="absmax")
        # 32 / (2 + 32/256) = 32/2.125 ≈ 15.06 — the paper's >15x at 2-bit.
        assert abs(rep.compression_ratio - 32 / 2.125) < 1e-6

    def test_excluded_layers_full_precision(self):
        rep = model_size_report({"first": 1000, "mid": 256000}, 4, exclude=["first"])
        assert rep.fp_bits == 1000 * 32
        assert rep.quantized_bits == 256000 * 4

    def test_per_param_bits(self):
        rep = model_size_report({"a": 2560, "b": 2560}, {"a": 2, "b": 8})
        assert rep.quantized_bits == 2560 * 2 + 2560 * 8

    def test_huffman_stream_reduces_size(self):
        rng = np.random.default_rng(0)
        skewed = rng.choice(16, size=25600, p=[0.9] + [1 / 150] * 15)
        rep = model_size_report(
            {"w": 25600}, 4, index_streams={"w": skewed}
        )
        assert rep.quantized_bits < 25600 * 4
        assert rep.mean_bits_per_weight["w"] < 2.0

    def test_tail_bucket_overhead(self):
        # 300 params → 2 buckets of scale overhead
        rep = model_size_report({"w": 300}, 4)
        assert rep.scale_overhead_bits == 2 * 2 * 32
