"""Independent NumPy golden reference for the quantization math.

Implemented directly from the paper's equations (arXiv:1802.05668 §"uniform
quantization" / §"differentiable quantization"), deliberately written in plain
loops/NumPy with no code shared with the framework, so framework bugs can't
hide in a shared helper (SURVEY.md §4: the oracle strategy).
"""

import numpy as np


def oracle_uniform_fake_quant(x, bits, bucket_size=256, scaling="linear"):
    """Bucketed uniform quantize-dequantize, loop-per-bucket."""
    flat = np.asarray(x, dtype=np.float64).reshape(-1)
    out = np.empty_like(flat)
    s = 2**bits - 1
    for start in range(0, flat.size, bucket_size):
        b = flat[start : start + bucket_size]
        if scaling == "linear":
            lo, hi = b.min(), b.max()
            rng = hi - lo
            if rng <= 0:
                out[start : start + bucket_size] = lo
                continue
            scaled = (b - lo) / rng
        elif scaling == "absmax":
            m = np.abs(b).max()
            if m <= 0:
                out[start : start + bucket_size] = 0.0
                continue
            scaled = (b / m + 1.0) / 2.0
        else:
            raise ValueError(scaling)
        # round-half-to-even like jnp.round / np.round
        q = np.clip(np.round(scaled * s), 0, s)
        deq = q / s
        if scaling == "linear":
            out[start : start + bucket_size] = deq * rng + lo
        else:
            out[start : start + bucket_size] = (deq * 2.0 - 1.0) * m
    return out.reshape(np.shape(x))


def oracle_codebook_fake_quant(x, points, bucket_size=256, scaling="linear"):
    """Bucketed nearest-point quantize-dequantize, loop-per-element."""
    flat = np.asarray(x, dtype=np.float64).reshape(-1)
    pts = np.asarray(points, dtype=np.float64)
    out = np.empty_like(flat)
    for start in range(0, flat.size, bucket_size):
        b = flat[start : start + bucket_size]
        if scaling == "linear":
            lo, hi = b.min(), b.max()
            rng = hi - lo if hi > lo else 1.0
            scaled = (b - lo) / rng
        else:
            m = np.abs(b).max()
            m2 = 2 * m if m > 0 else 1.0
            scaled = (b + m) / m2
        deq = np.empty_like(scaled)
        for i, v in enumerate(scaled):
            j = np.argmin(np.abs(pts - v))
            # tie-break toward the lower point value, like the framework
            cand = np.where(np.abs(pts - v) == np.abs(pts[j] - v))[0]
            j = cand[np.argmin(pts[cand])]
            deq[i] = pts[j]
        if scaling == "linear":
            out[start : start + bucket_size] = deq * rng + lo
        else:
            out[start : start + bucket_size] = deq * m2 - m
    return out.reshape(np.shape(x))


def oracle_pack_unpack(levels, bits):
    """Bit-pack and unpack, bit-by-bit."""
    f = 8 // bits
    flat = np.asarray(levels, dtype=np.int64).reshape(-1, f)
    packed = np.zeros(flat.shape[0], dtype=np.uint8)
    for i in range(f):
        packed |= (flat[:, i].astype(np.uint8)) << (i * bits)
    unpacked = np.zeros_like(flat)
    for i in range(f):
        unpacked[:, i] = (packed >> (i * bits)) & ((1 << bits) - 1)
    return packed, unpacked.reshape(np.shape(levels))
