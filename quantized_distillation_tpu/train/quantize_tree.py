"""Parameter-tree quantization transforms.

The reference applies quantization imperatively: the train loop stashes
``param.data``, overwrites each weight tensor with its quantized value, runs
forward/backward, restores (``cnn_models/help_fun.py``). Here the same effect
is one functional transform over the parameter pytree, applied *inside* the
jitted train step: ``q_params = ste_quantize_tree(params, spec)``. Autodiff
through the STE gives gradients on the full-precision master weights; XLA
fuses the per-bucket reductions into the step.

Which leaves quantize: weight matrices/kernels (ndim >= 2: Dense/Conv/LSTM
kernels, embeddings), excluding any path matching ``QuantSpec.exclude``
patterns. Biases and norm scales (ndim 1) stay full precision, matching the
reference's accounting where scale overhead dominates such tiny vectors.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import QuantSpec
from ..ops import codebook as cb
from ..ops import uniform
from ..ops.huffman import mean_bits_per_symbol

PyTree = Any


def path_str(path) -> str:
    """jax key-path → 'a/b/c' string used for exclusion matching & reports."""
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def is_quantizable(path: str, leaf: jnp.ndarray, spec: QuantSpec) -> bool:
    return leaf.ndim >= 2 and not spec.excludes(path)


def map_quantizable(
    fn: Callable[[str, jnp.ndarray], jnp.ndarray], params: PyTree, spec: QuantSpec
) -> PyTree:
    """Apply ``fn`` to quantizable leaves, identity elsewhere."""

    def wrap(path, leaf):
        p = path_str(path)
        return fn(p, leaf) if is_quantizable(p, leaf, spec) else leaf

    return jax.tree_util.tree_map_with_path(wrap, params)


def _fused_fake_quant_values(
    params: PyTree,
    spec: QuantSpec,
    bits_map: Optional[Dict[str, int]],
    force: bool = False,
) -> Optional[Dict[str, jnp.ndarray]]:
    """Hard fake-quant VALUES for every quantizable leaf via ONE fused
    Pallas kernel launch per bits-group, or None when ineligible.

    Per-leaf dispatch instantiates one Mosaic kernel per unique leaf shape
    (a WRN tree has dozens — measured as minutes of extra compile through
    the remote-compile hook). Bucketing is per leaf (identical quantization
    decisions), so all leaves' [n_buckets, 256] matrices concatenate into
    one batch for a single kernel whose shape depends only on the TOTAL
    bucket count.
    """
    if spec.stochastic or spec.bucket_size % 128 != 0:
        return None
    if jax.default_backend() != "tpu" and not force:
        return None
    from ..kernels.fake_quant import fake_quant_buckets_pallas
    from ..ops.bucketing import from_buckets, to_buckets

    interpret = jax.default_backend() == "cpu"

    groups: Dict[int, list] = {}

    def collect(path, leaf):
        bits = bits_map.get(path, spec.bits) if bits_map else spec.bits
        groups.setdefault(bits, []).append((path, leaf))
        return leaf

    map_quantizable(collect, params, spec)
    out: Dict[str, jnp.ndarray] = {}
    for bits, leaves in groups.items():
        buckets = []
        meta = []
        for path, leaf in leaves:
            b, n = to_buckets(jax.lax.stop_gradient(leaf), spec.bucket_size)
            meta.append((path, leaf, n, b.shape[0]))
            buckets.append(b)
        qcat = fake_quant_buckets_pallas(
            jnp.concatenate(buckets, axis=0), bits, scaling=spec.scaling,
            interpret=interpret,
        )
        off = 0
        for path, leaf, n, nb in meta:
            qb = qcat[off : off + nb]
            off += nb
            out[path] = from_buckets(qb, n, tuple(leaf.shape)).astype(leaf.dtype)
    return out


def ste_quantize_tree(
    params: PyTree,
    spec: QuantSpec,
    key: Optional[jax.Array] = None,
    bits_map: Optional[Dict[str, int]] = None,
) -> PyTree:
    """Uniform fake-quant every quantizable leaf, straight-through gradient.

    With stochastic rounding each leaf gets an independent key (folded from
    a per-leaf counter) so rounding noise is uncorrelated across tensors.
    ``bits_map`` (path → bits, from :mod:`.bits`) overrides ``spec.bits``
    per leaf for mixed-precision assignments. On TPU the deterministic path
    runs ONE fused Pallas fake-quant launch per bits-group over all leaves'
    buckets (see :func:`_fused_fake_quant_values`).
    """
    fused = _fused_fake_quant_values(params, spec, bits_map)
    if fused is not None:
        return map_quantizable(
            lambda p, x: x + jax.lax.stop_gradient(fused[p] - x), params, spec
        )
    counter = [0]

    def quant(path, leaf):
        leaf_key = None
        if spec.stochastic:
            if key is None:
                raise ValueError("stochastic rounding requires a PRNG key")
            leaf_key = jax.random.fold_in(key, counter[0])
            counter[0] += 1
        return uniform.ste_fake_quant(
            leaf,
            bits_map.get(path, spec.bits) if bits_map else spec.bits,
            bucket_size=spec.bucket_size,
            scaling=spec.scaling,
            stochastic=spec.stochastic,
            key=leaf_key,
        )

    return map_quantizable(quant, params, spec)


def init_codebook_tree(
    params: PyTree, spec: QuantSpec, mode: str = "uniform"
) -> Dict[str, jnp.ndarray]:
    """One learnable codebook (2^bits points) per quantizable leaf.

    Flat dict keyed by path string — this is the trainable pytree for
    differentiable quantization (reference:
    ``quantization/help_functions.py`` point initialization).
    """
    books: Dict[str, jnp.ndarray] = {}

    def build(path, leaf):
        if mode == "quantile":
            from ..ops.bucketing import apply_scale, compute_scale, to_buckets

            b, _ = to_buckets(leaf, spec.bucket_size)
            sp = compute_scale(b, spec.scaling)
            x01 = apply_scale(b, sp)
            books[path] = cb.init_points(spec.bits, "quantile", x01)
        else:
            books[path] = cb.init_points(spec.bits, mode)
        return leaf

    map_quantizable(build, params, spec)
    return books


def ste_codebook_tree(
    params: PyTree, codebooks: Dict[str, jnp.ndarray], spec: QuantSpec
) -> PyTree:
    """Codebook fake-quant each quantizable leaf.

    Gradients: straight-through to the weights, scatter-add to the codebook
    points — so the same transform serves both joint training and
    frozen-weight differentiable quantization (where only ``codebooks`` are
    optimized).
    """

    def quant(path, leaf):
        return cb.ste_fake_quant(
            leaf,
            codebooks[path],
            bucket_size=spec.bucket_size,
            scaling=spec.scaling,
        )

    return map_quantizable(quant, params, spec)


def quantize_tree_hard(
    params: PyTree,
    spec: QuantSpec,
    codebooks: Optional[Dict[str, jnp.ndarray]] = None,
    bits_map: Optional[Dict[str, int]] = None,
) -> PyTree:
    """Non-STE quantize-dequantize (deployment values, no gradient path)."""
    if spec.method == "codebook":
        if codebooks is None:
            raise ValueError("codebook method requires codebooks")
        return map_quantizable(
            lambda p, w: cb.fake_quant(
                w, codebooks[p], bucket_size=spec.bucket_size, scaling=spec.scaling
            ),
            params,
            spec,
        )
    fused = _fused_fake_quant_values(params, spec, bits_map)
    if fused is not None:
        return map_quantizable(lambda p, _: fused[p], params, spec)
    return map_quantizable(
        lambda p, w: uniform.fake_quant(
            w,
            bits_map.get(p, spec.bits) if bits_map else spec.bits,
            bucket_size=spec.bucket_size,
            scaling=spec.scaling,
        ),
        params,
        spec,
    )


def index_streams(
    params: PyTree,
    spec: QuantSpec,
    codebooks: Optional[Dict[str, jnp.ndarray]] = None,
) -> Dict[str, np.ndarray]:
    """Quantization-index stream per leaf, for Huffman size accounting."""
    streams: Dict[str, np.ndarray] = {}

    def collect(path, leaf):
        if spec.method == "codebook" and codebooks is not None:
            ct = cb.quantize(
                leaf, codebooks[path], bucket_size=spec.bucket_size,
                scaling=spec.scaling,
            )
            idx, n = ct.idx, ct.n
        else:
            qt = uniform.quantize(
                leaf, spec.bits, bucket_size=spec.bucket_size, scaling=spec.scaling
            )
            idx, n = qt.levels, qt.n
        streams[path] = np.asarray(idx).reshape(-1)[:n]
        return leaf

    map_quantizable(collect, params, spec)
    return streams


def param_sizes(params: PyTree) -> Dict[str, int]:
    """Parameter path → element count (for size reports)."""
    out: Dict[str, int] = {}

    def count(path, leaf):
        out[path_str(path)] = int(np.prod(leaf.shape))
        return leaf

    jax.tree_util.tree_map_with_path(count, params)
    return out
