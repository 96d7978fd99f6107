"""Native C++ codec/packing/batching + compressed artifact roundtrips.

Oracles: the pure-Python accounting in ops/huffman.py (optimal mean code
length — a correct codec must hit it exactly), ops/packing.py (layout twin),
and quantize_tree_hard (artifact restore must be bit-exact deployment params).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantized_distillation_tpu import native
from quantized_distillation_tpu.config import QuantSpec
from quantized_distillation_tpu.ops import packing
from quantized_distillation_tpu.ops.huffman import (
    entropy_bits_per_symbol,
    mean_bits_per_symbol,
)


def test_native_available():
    # g++ is part of the environment contract; the fallback exists for
    # deployment images without a toolchain, not for CI.
    assert native.available()


@pytest.mark.parametrize("alphabet", [2, 4, 16, 256])
def test_huffman_roundtrip_and_optimality(alphabet):
    rng = np.random.default_rng(alphabet)
    p = rng.dirichlet(np.ones(alphabet) * 0.4)
    idx = rng.choice(alphabet, size=20000, p=p).astype(np.int32)
    payload, lens, nbits = native.huffman_encode(idx, alphabet)
    assert nbits <= len(payload) * 8
    back = native.huffman_decode(payload, nbits, lens, idx.size)
    np.testing.assert_array_equal(back, idx)
    # codec bit count == accounting's optimal mean length, >= entropy
    assert nbits / idx.size == pytest.approx(mean_bits_per_symbol(idx))
    assert nbits / idx.size >= entropy_bits_per_symbol(idx) - 1e-9


def test_huffman_single_symbol():
    idx = np.zeros(100, np.int32)
    payload, lens, nbits = native.huffman_encode(idx, 4)
    assert nbits == 100  # 1 bit/symbol degenerate code
    np.testing.assert_array_equal(native.huffman_decode(payload, nbits, lens, 100), idx)


def test_huffman_python_fallback_matches():
    rng = np.random.default_rng(7)
    idx = rng.integers(0, 8, 500).astype(np.int32)
    payload, lens, nbits = native.huffman_encode(idx, 8)
    # decode with the pure-Python path against the native encoding
    lib, native._lib = native._lib, None
    tried = native._tried
    native._tried = True
    try:
        back = native.huffman_decode(payload, nbits, lens, idx.size)
        payload2, lens2, nbits2 = native.huffman_encode(idx, 8)
    finally:
        native._lib, native._tried = lib, tried
    np.testing.assert_array_equal(back, idx)
    assert payload2 == payload and nbits2 == nbits
    np.testing.assert_array_equal(lens2, lens)


@pytest.mark.parametrize("bits", [2, 4, 8])
def test_pack_stream_matches_jnp_layout(bits):
    rng = np.random.default_rng(bits)
    lv = rng.integers(0, 1 << bits, 2048).astype(np.int32)
    packed = native.pack_stream(lv, bits)
    ref = np.asarray(packing.pack(jnp.asarray(lv), bits))
    np.testing.assert_array_equal(packed, ref)
    np.testing.assert_array_equal(native.unpack_stream(packed, bits), lv)


def test_pad_batch():
    sents = [[5, 6, 7], [8], list(range(10, 30))]
    out, lens = native.pad_batch(sents, 8, pad=0)
    assert out.shape == (3, 8)
    np.testing.assert_array_equal(lens, [3, 1, 8])
    np.testing.assert_array_equal(out[0], [5, 6, 7, 0, 0, 0, 0, 0])
    np.testing.assert_array_equal(out[2], list(range(10, 18)))


@pytest.mark.parametrize("method", ["uniform", "codebook"])
def test_artifact_roundtrip_bit_exact(tmp_path, method):
    from quantized_distillation_tpu.train.quantize_tree import (
        init_codebook_tree,
        quantize_tree_hard,
    )
    from quantized_distillation_tpu.utils.artifact import load_artifact, save_artifact

    rng = jax.random.PRNGKey(0)
    params = {
        "dense": {"kernel": jax.random.normal(rng, (40, 30)),
                  "bias": jnp.ones((30,))},
        "emb": {"embedding": jax.random.normal(jax.random.fold_in(rng, 1), (50, 16))},
    }
    spec = QuantSpec(bits=4, method=method)
    books = init_codebook_tree(params, spec) if method == "codebook" else None
    stats = save_artifact(str(tmp_path / "m.qdt"), params, spec, codebooks=books)
    # 4-bit + scales << fp32 (tiny test tensors: header/scale overhead is a
    # large fraction, so the bound is loose; real models hit ~7-8x, see
    # test_artifact_meta_and_size_accounting)
    assert stats["compression_ratio"] > 3
    restored, meta = load_artifact(str(tmp_path / "m.qdt"), params)
    expect = quantize_tree_hard(params, spec, codebooks=books)
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(restored),
        jax.tree_util.tree_leaves_with_path(expect),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-6)


def test_artifact_meta_and_size_accounting(tmp_path):
    from quantized_distillation_tpu.utils.artifact import load_artifact, save_artifact

    params = {"w": jax.random.normal(jax.random.PRNGKey(3), (64, 64))}
    spec = QuantSpec(bits=2)
    stats = save_artifact(
        str(tmp_path / "m.qdt"), params, spec, meta={"run": "test", "step": 7}
    )
    _, meta = load_artifact(str(tmp_path / "m.qdt"), params)
    assert meta == {"run": "test", "step": 7}
    # 2-bit + 2 f32/256 weights + huffman: file must beat 8x compression
    assert stats["compression_ratio"] > 8


def test_artifact_to_packed_serving_end_to_end(tmp_path):
    """The full deploy loop: trained params -> compressed .qdt artifact on
    disk -> load -> pack_decoder -> packed beam search, producing EXACTLY
    the tokens of serving from the in-memory hard-quantized params (the
    artifact stores grid values, and re-quantizing on-grid values is
    idempotent)."""
    from quantized_distillation_tpu.config import BeamConfig
    from quantized_distillation_tpu.models import make_seq2seq
    from quantized_distillation_tpu.serve import beam_search_packed, pack_decoder
    from quantized_distillation_tpu.train.quantize_tree import quantize_tree_hard
    from quantized_distillation_tpu.utils.artifact import load_artifact, save_artifact

    m = make_seq2seq("student_small", 40, 50, hidden=64, embed_dim=32, dropout=0.0)
    rng = np.random.default_rng(5)
    src = jnp.asarray(rng.integers(4, 40, (4, 10)), jnp.int32)
    sl = jnp.full((4,), 10, jnp.int32)
    v = m.init(jax.random.PRNGKey(0), src, sl, jnp.ones((4, 2), jnp.int32))
    spec = QuantSpec(bits=4)

    stats = save_artifact(str(tmp_path / "deploy.qdt"), v["params"], spec)
    assert stats["compression_ratio"] > 3
    restored, _ = load_artifact(str(tmp_path / "deploy.qdt"), v["params"])

    cfg = BeamConfig(beam_size=3, max_len=8)
    dec_mem = pack_decoder(
        quantize_tree_hard(v["params"], spec), m.cfg, 4,
        compute_dtype=jnp.float32, use_pallas=False,
    )
    dec_disk = pack_decoder(
        restored, m.cfg, 4, compute_dtype=jnp.float32, use_pallas=False
    )
    t_mem, s_mem = beam_search_packed(m, {"params": quantize_tree_hard(v["params"], spec)}, dec_mem, src, sl, cfg)
    t_disk, s_disk = beam_search_packed(m, {"params": restored}, dec_disk, src, sl, cfg)
    # the artifact dequantizes levels*scale+offset in a different op order
    # than quantize_tree_hard, so values agree to ~1 ulp — near-degenerate
    # beam ties may flip late tokens; scores and the vast majority of
    # tokens must agree
    agree = float((np.asarray(t_mem) == np.asarray(t_disk)).mean())
    assert agree >= 0.9, agree
    np.testing.assert_allclose(np.asarray(s_mem), np.asarray(s_disk), rtol=1e-3)
