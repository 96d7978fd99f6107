"""Pallas TPU kernels: packed weights, fused dequant+matmul.

The executable replacement for the reference's ``quantization/`` tensor math
on the serving path (north-star: packed INT2/4/8 weights resident in HBM,
dequant fused into the matmuls).
"""

from .beam_combine import beam_combine_topk
from .dequant_matmul import dequant_matmul, dequant_matmul_reference
from .topk_fused import (
    dequant_matmul_topk,
    dequant_matmul_topk_reference,
    pick_generator_group,
)
from .packed import BUCKET, PackedLinear, dequantize_linear, pack_linear, plane_unpack

__all__ = [
    "beam_combine_topk",
    "dequant_matmul",
    "dequant_matmul_reference",
    "dequant_matmul_topk",
    "dequant_matmul_topk_reference",
    "pick_generator_group",
    "BUCKET",
    "PackedLinear",
    "dequantize_linear",
    "pack_linear",
    "plane_unpack",
]
