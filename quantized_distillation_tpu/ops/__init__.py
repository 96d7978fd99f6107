"""Quantization core: pure-functional bucketed quant math (jnp, CPU-runnable).

Covers the reference's ``quantization/`` package (``uniformQuantization``,
``nonUniformQuantization``, Huffman accounting) plus real sub-byte packing.
"""

from . import bucketing, codebook, huffman, packing, sizes, uniform
from .bucketing import (
    ABSMAX,
    DEFAULT_BUCKET_SIZE,
    LINEAR,
    ScaleParams,
    apply_scale,
    compute_scale,
    from_buckets,
    invert_scale,
    to_buckets,
)
from .codebook import CodebookQuantizedTensor, init_points, nearest_point_idx
from .packing import pack, unpack
from .sizes import SizeReport, model_size_report
from .uniform import QuantizedTensor, fake_quant, ste_fake_quant

__all__ = [
    "bucketing",
    "codebook",
    "huffman",
    "packing",
    "sizes",
    "uniform",
    "ABSMAX",
    "DEFAULT_BUCKET_SIZE",
    "LINEAR",
    "ScaleParams",
    "apply_scale",
    "compute_scale",
    "from_buckets",
    "invert_scale",
    "to_buckets",
    "CodebookQuantizedTensor",
    "init_points",
    "nearest_point_idx",
    "pack",
    "unpack",
    "SizeReport",
    "model_size_report",
    "QuantizedTensor",
    "fake_quant",
    "ste_fake_quant",
]
