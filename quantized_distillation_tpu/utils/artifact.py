"""Compressed model artifacts: Huffman-coded quantized checkpoints on disk.

The reference only *reports* the Huffman-compressed size of a quantized model
(``quantization/help_functions.py`` + ``helpers/functions.py`` size math) —
the bytes are never written. Here the artifact is real: every quantizable
weight is bucketed-quantized, its index stream entropy-coded with the native
canonical-Huffman codec (:mod:`..native`, C++), and the result is a single
self-describing file that :func:`load_artifact` restores bit-exactly to the
deployment (hard-quantized) parameters. The measured file size is the ground
truth the size-accounting math (:mod:`..ops.sizes`) estimates.

Container layout (little-endian):

    magic b"QDTA" | version u32 | header_len u64 | header JSON | blob

The header carries per-tensor metadata (shape, bits, scaling kind, element
count, payload offsets/bit-counts) plus optional user meta; the blob holds,
per tensor: the Huffman length table (2^bits bytes), the coded index payload,
and the per-bucket scale/offset arrays (f32). Unquantized leaves (biases,
norm vectors) are stored raw f32.
"""

from __future__ import annotations

import io
import json
import os
import struct
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import native
from ..config import QuantSpec
from ..ops import codebook as cb
from ..ops import uniform
from ..train.quantize_tree import is_quantizable, path_str

PyTree = Any

MAGIC = b"QDTA"
VERSION = 1


def _flatten(params: PyTree) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}

    def put(path, leaf):
        out[path_str(path)] = np.asarray(leaf)
        return leaf

    jax.tree_util.tree_map_with_path(put, params)
    return out


def _unflatten(template: PyTree, flat: Dict[str, np.ndarray]) -> PyTree:
    def get(path, leaf):
        return jnp.asarray(flat[path_str(path)])

    return jax.tree_util.tree_map_with_path(get, template)


def save_artifact(
    path: str,
    params: PyTree,
    spec: QuantSpec,
    *,
    codebooks: Optional[Dict[str, jnp.ndarray]] = None,
    bits_map: Optional[Dict[str, int]] = None,
    meta: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Write a compressed artifact; → stats (bytes, ratio vs fp32, per-tensor).

    ``codebooks`` switches to non-uniform (learned-point) indices; the per-leaf
    point vector is stored alongside. ``bits_map`` gives per-leaf bit widths.
    """
    flat = _flatten(params)
    blob = io.BytesIO()
    tensors: Dict[str, Dict[str, Any]] = {}
    fp32_bytes = 0
    for name, arr in flat.items():
        fp32_bytes += arr.size * 4
        entry: Dict[str, Any] = {"shape": list(arr.shape)}
        if is_quantizable(name, arr, spec) and np.issubdtype(arr.dtype, np.floating):
            bits = bits_map.get(name, spec.bits) if bits_map else spec.bits
            if spec.method == "codebook" and codebooks is not None:
                ct = cb.quantize(
                    jnp.asarray(arr), codebooks[name],
                    bucket_size=spec.bucket_size, scaling=spec.scaling,
                )
                idx, sp, n = np.asarray(ct.idx), ct.scale, ct.n
                bits = int(np.asarray(codebooks[name]).size).bit_length() - 1
                entry["points"] = np.asarray(codebooks[name], np.float32).tolist()
            else:
                qt = uniform.quantize(
                    jnp.asarray(arr), bits,
                    bucket_size=spec.bucket_size, scaling=spec.scaling,
                )
                idx, sp, n = np.asarray(qt.levels), qt.scale, qt.n
            stream = idx.reshape(-1)[:n]
            alphabet = 1 << bits
            payload, lens, nbits = native.huffman_encode(stream, alphabet)
            scale = np.asarray(sp.scale, np.float32).reshape(-1)
            offset = np.asarray(sp.offset, np.float32).reshape(-1)
            entry.update(
                quant=True, bits=bits, scaling=sp.kind, n=int(n),
                bucket_size=spec.bucket_size, n_bits=int(nbits),
                lens_off=blob.tell(),
            )
            blob.write(lens.tobytes())
            entry["payload_off"] = blob.tell()
            entry["payload_len"] = (nbits + 7) // 8
            blob.write(payload[: entry["payload_len"]])
            entry["scale_off"] = blob.tell()
            entry["n_buckets"] = scale.size
            blob.write(scale.tobytes())
            blob.write(offset.tobytes())
        else:
            raw = np.ascontiguousarray(arr, np.float32)
            entry.update(quant=False, raw_off=blob.tell(), raw_len=raw.nbytes)
            blob.write(raw.tobytes())
        tensors[name] = entry

    header = json.dumps(
        {"tensors": tensors, "meta": meta or {}, "spec": {
            "bits": spec.bits, "bucket_size": spec.bucket_size,
            "scaling": spec.scaling, "method": spec.method}},
    ).encode()
    payload = blob.getvalue()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<IQ", VERSION, len(header)))
        f.write(header)
        f.write(payload)
    total = len(MAGIC) + 12 + len(header) + len(payload)
    return {
        "file_bytes": total,
        "fp32_bytes": fp32_bytes,
        "compression_ratio": fp32_bytes / max(total, 1),
        "tensors": {
            k: (v.get("payload_len", v.get("raw_len", 0))) for k, v in tensors.items()
        },
    }


def load_artifact(path: str, template: PyTree) -> Tuple[PyTree, Dict[str, Any]]:
    """Read an artifact → (deployment params matching ``template``, meta).

    Restored values equal ``quantize_tree_hard`` of the saved parameters
    bit-exactly (dequantization is deterministic arithmetic on the decoded
    integer levels and stored f32 scales).
    """
    with open(path, "rb") as f:
        if f.read(4) != MAGIC:
            raise ValueError(f"{path}: not a QDTA artifact")
        version, hlen = struct.unpack("<IQ", f.read(12))
        if version != VERSION:
            raise ValueError(f"{path}: unsupported version {version}")
        header = json.loads(f.read(hlen))
        blob = f.read()
    out: Dict[str, np.ndarray] = {}
    for name, e in header["tensors"].items():
        shape = tuple(e["shape"])
        if not e["quant"]:
            raw = np.frombuffer(
                blob, np.float32, count=e["raw_len"] // 4, offset=e["raw_off"]
            )
            out[name] = raw.reshape(shape).copy()
            continue
        bits, n = e["bits"], e["n"]
        alphabet = 1 << bits
        lens = np.frombuffer(blob, np.uint8, count=alphabet, offset=e["lens_off"])
        payload = blob[e["payload_off"] : e["payload_off"] + e["payload_len"]]
        stream = native.huffman_decode(payload, e["n_bits"], lens, n)
        nb = e["n_buckets"]
        scale = np.frombuffer(blob, np.float32, count=nb, offset=e["scale_off"])
        offset = np.frombuffer(
            blob, np.float32, count=nb, offset=e["scale_off"] + 4 * nb
        )
        bs = e["bucket_size"]
        pad = nb * bs - n
        levels = np.pad(stream, (0, pad), mode="edge").reshape(nb, bs)
        if "points" in e:
            pts = np.asarray(e["points"], np.float32)
            x01 = pts[levels]
        else:
            x01 = levels.astype(np.float32) / ((1 << bits) - 1)
        vals = x01 * scale[:, None] + offset[:, None]
        out[name] = vals.reshape(-1)[:n].reshape(shape).astype(np.float32)
    return _unflatten(template, out), header.get("meta", {})
