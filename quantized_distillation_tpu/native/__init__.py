"""Native (C++) host-runtime components, bound via ctypes.

The TPU compute path is jax/XLA/Pallas; the host runtime around it is native
C++ (``csrc/qdt_native.cpp``): a canonical-Huffman codec over quantization
indices, sub-byte bit packing (same layout as :mod:`..ops.packing`), and
padded-batch assembly. The reference has no native code of its own and its
Huffman machinery is accounting-only (``quantization/help_functions.py``);
here coded weights are actually written/read (see :mod:`..utils.artifact`).

The shared library is compiled on first use with ``g++ -O3`` into
``native/_build/`` and cached; every entry point has a pure-NumPy fallback so
the framework degrades gracefully where no toolchain exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, os.pardir, os.pardir, "csrc", "qdt_native.cpp")
_BUILD_DIR = os.path.join(_HERE, "_build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libqdt_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _compile() -> Optional[str]:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src):
        return _LIB_PATH
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        src, "-o", _LIB_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError):
        return None
    return _LIB_PATH


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _compile()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        u64p = ctypes.POINTER(ctypes.c_uint64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.qdt_huffman_lengths.restype = ctypes.c_int
        lib.qdt_huffman_lengths.argtypes = [u64p, ctypes.c_int32, u8p]
        lib.qdt_huffman_encode.restype = ctypes.c_int64
        lib.qdt_huffman_encode.argtypes = [
            i32p, ctypes.c_int64, u8p, ctypes.c_int32, u8p, ctypes.c_int64]
        lib.qdt_huffman_decode.restype = ctypes.c_int64
        lib.qdt_huffman_decode.argtypes = [
            u8p, ctypes.c_int64, u8p, ctypes.c_int32, i32p, ctypes.c_int64]
        lib.qdt_pack.restype = ctypes.c_int64
        lib.qdt_pack.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32, u8p]
        lib.qdt_unpack.restype = ctypes.c_int64
        lib.qdt_unpack.argtypes = [u8p, ctypes.c_int64, ctypes.c_int32, i32p]
        lib.qdt_pad_batch.restype = ctypes.c_int
        lib.qdt_pad_batch.argtypes = [
            i32p, i64p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            i32p, i32p]
        _lib = lib
        return _lib


def available() -> bool:
    """True when the native library compiled and loaded."""
    return _load() is not None


def _as(arr: np.ndarray, dtype, ctype):
    a = np.ascontiguousarray(arr, dtype=dtype)
    return a, a.ctypes.data_as(ctypes.POINTER(ctype))


# ---------------------------------------------------------------------------
# Huffman codec
# ---------------------------------------------------------------------------

def huffman_lengths(freqs: np.ndarray) -> np.ndarray:
    """Code length per symbol (uint8; 0 = absent) from a frequency array."""
    freqs = np.asarray(freqs, np.uint64)
    lib = _load()
    out = np.zeros(freqs.size, np.uint8)
    if lib is not None:
        f, fp = _as(freqs, np.uint64, ctypes.c_uint64)
        _, op = _as(out, np.uint8, ctypes.c_uint8)
        if lib.qdt_huffman_lengths(fp, freqs.size, op) == 0:
            return out
    # fallback: reuse the pure-Python construction
    from ..ops.huffman import code_lengths

    table = code_lengths({i: int(f) for i, f in enumerate(freqs)})
    for s, l in table.items():
        out[s] = l
    return out


def huffman_encode(indices: np.ndarray, alphabet: int) -> Tuple[bytes, np.ndarray, int]:
    """Canonical-Huffman encode an index stream.

    → (payload bytes, per-symbol length table [alphabet] uint8, n_bits).
    The length table is the complete side info: the decoder rebuilds the
    identical canonical codebook from it.
    """
    idx = np.ascontiguousarray(indices, np.int32).reshape(-1)
    freqs = np.bincount(idx, minlength=alphabet).astype(np.uint64)
    lens = huffman_lengths(freqs)
    total_bits = int((freqs * lens).sum())
    cap = max((total_bits + 7) // 8, 1)
    out = np.zeros(cap, np.uint8)
    lib = _load()
    if lib is not None and idx.size:
        _, ip = _as(idx, np.int32, ctypes.c_int32)
        _, lp = _as(lens, np.uint8, ctypes.c_uint8)
        _, op = _as(out, np.uint8, ctypes.c_uint8)
        nbits = lib.qdt_huffman_encode(ip, idx.size, lp, alphabet, op, cap)
        if nbits < 0:
            raise ValueError("huffman_encode: invalid stream")
        return out.tobytes(), lens, int(nbits)
    # pure-Python fallback
    codes = _canonical_codes(lens)
    bitpos = 0
    for s in idx:
        l = int(lens[s])
        if l == 0:
            raise ValueError(f"symbol {s} has no code")
        c = codes[s]
        for b in range(l - 1, -1, -1):
            if (c >> b) & 1:
                out[bitpos >> 3] |= 0x80 >> (bitpos & 7)
            bitpos += 1
    return out.tobytes(), lens, bitpos


def huffman_decode(
    payload: bytes, n_bits: int, lens: np.ndarray, n_symbols: int
) -> np.ndarray:
    """Inverse of :func:`huffman_encode`: → int32 index stream [n_symbols]."""
    lens = np.ascontiguousarray(lens, np.uint8)
    data = np.frombuffer(payload, np.uint8)
    out = np.zeros(n_symbols, np.int32)
    lib = _load()
    if lib is not None:
        d, dp = _as(data, np.uint8, ctypes.c_uint8)
        _, lp = _as(lens, np.uint8, ctypes.c_uint8)
        _, op = _as(out, np.int32, ctypes.c_int32)
        got = lib.qdt_huffman_decode(dp, n_bits, lp, lens.size, op, n_symbols)
        if got != n_symbols:
            raise ValueError("huffman_decode: malformed stream")
        return out
    codes = _canonical_codes(lens)
    lookup = {(int(lens[s]), int(codes[s])): s for s in range(lens.size) if lens[s]}
    bitpos, code, l = 0, 0, 0
    for i in range(n_symbols):
        code, l = 0, 0
        while True:
            if bitpos >= n_bits:
                raise ValueError("huffman_decode: truncated stream")
            code = (code << 1) | ((data[bitpos >> 3] >> (7 - (bitpos & 7))) & 1)
            bitpos += 1
            l += 1
            if (l, code) in lookup:
                out[i] = lookup[(l, code)]
                break
    return out


def _canonical_codes(lens: np.ndarray) -> np.ndarray:
    """Canonical code values ordered by (length, symbol) — mirrors the C++."""
    max_len = int(lens.max()) if lens.size else 0
    codes = np.zeros(lens.size, np.uint32)
    if max_len == 0:
        return codes
    count = np.bincount(lens, minlength=max_len + 1)
    count[0] = 0
    nxt = np.zeros(max_len + 1, np.uint32)
    code = 0
    for l in range(1, max_len + 1):
        code = (code + int(count[l - 1])) << 1
        nxt[l] = code
    for s in range(lens.size):
        if lens[s]:
            codes[s] = nxt[lens[s]]
            nxt[lens[s]] += 1
    return codes


# ---------------------------------------------------------------------------
# Sub-byte packing (host-side twin of ops/packing.py)
# ---------------------------------------------------------------------------

def pack_stream(levels: np.ndarray, bits: int) -> np.ndarray:
    """Pack a flat int level stream into uint8 (ops/packing.py layout)."""
    lv = np.ascontiguousarray(levels, np.int32).reshape(-1)
    f = 8 // bits
    if lv.size % f:
        raise ValueError(f"stream length {lv.size} not a multiple of {f}")
    out = np.zeros(lv.size // f, np.uint8)
    lib = _load()
    if lib is not None:
        _, ip = _as(lv, np.int32, ctypes.c_int32)
        _, op = _as(out, np.uint8, ctypes.c_uint8)
        if lib.qdt_pack(ip, lv.size, bits, op) < 0:
            raise ValueError("pack_stream: level out of range")
        return out
    v = lv.reshape(-1, f).astype(np.uint32)
    if (v >> bits).any():
        raise ValueError("pack_stream: level out of range")
    for k in range(f):
        out |= (v[:, k] << (k * bits)).astype(np.uint8)
    return out


def unpack_stream(packed: np.ndarray, bits: int) -> np.ndarray:
    """Inverse of :func:`pack_stream` → int32 levels."""
    pk = np.ascontiguousarray(packed, np.uint8).reshape(-1)
    f = 8 // bits
    out = np.zeros(pk.size * f, np.int32)
    lib = _load()
    if lib is not None:
        _, ip = _as(pk, np.uint8, ctypes.c_uint8)
        _, op = _as(out, np.int32, ctypes.c_int32)
        lib.qdt_unpack(ip, pk.size, bits, op)
        return out
    mask = (1 << bits) - 1
    for k in range(f):
        out[k::f] = (pk >> (k * bits)) & mask
    return out


# ---------------------------------------------------------------------------
# Batch assembly
# ---------------------------------------------------------------------------

def pad_batch(
    sentences, max_len: int, pad: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Ragged token lists → (padded [B, max_len] int32, lengths [B] int32)."""
    b = len(sentences)
    flat = np.concatenate(
        [np.asarray(s, np.int32).reshape(-1) for s in sentences]
    ) if b else np.zeros(0, np.int32)
    offsets = np.zeros(b + 1, np.int64)
    np.cumsum([len(s) for s in sentences], out=offsets[1:])
    out = np.zeros((b, max_len), np.int32)
    lens = np.zeros(b, np.int32)
    lib = _load()
    if lib is not None and b:
        f, fp = _as(flat, np.int32, ctypes.c_int32)
        o, op = _as(offsets, np.int64, ctypes.c_int64)
        _, outp = _as(out, np.int32, ctypes.c_int32)
        _, lp = _as(lens, np.int32, ctypes.c_int32)
        if lib.qdt_pad_batch(fp, op, b, max_len, pad, outp, lp) == 0:
            return out, lens
    out[:] = pad
    for i, s in enumerate(sentences):
        n = min(len(s), max_len)
        out[i, :n] = np.asarray(s[:n], np.int32)
        lens[i] = n
    return out, lens
