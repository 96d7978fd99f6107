"""Automatic bit-width assignment across layers.

Re-designs the reference's ``assign_bits_automatically`` heuristic
(``quantization/help_functions.py``, used by differentiable quantization —
SURVEY.md C3): give more bits to layers whose weights the loss is more
sensitive to, under a mean-bits budget.

Sensitivity here is measured as the gradient-weight interaction
``s_l = || g_l ⊙ w_l ||_1 / n_l`` (per-weight first-order loss change if the
layer's weights are perturbed), averaged over a few batches. Layers are then
greedily bumped from the floor bit-width toward the ceiling, highest
sensitivity-per-parameter first, until the parameter-weighted mean hits the
budget.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import QuantSpec
from .quantize_tree import is_quantizable, path_str

PyTree = Any

ALLOWED_BITS = (2, 4, 8)


def gradient_sensitivities(
    loss_fn: Callable[[PyTree, Any], jnp.ndarray],
    params: PyTree,
    batches: Iterable[Any],
    spec: QuantSpec,
) -> Dict[str, float]:
    """path → mean |g ⊙ w| per weight, averaged over ``batches``."""
    grad_fn = jax.jit(jax.grad(loss_fn))
    acc: Dict[str, float] = {}
    count = 0
    for batch in batches:
        grads = grad_fn(params, batch)

        # tree_map_with_path over BOTH trees: a params/grads structure
        # mismatch raises instead of silently mispairing leaves (which a
        # flatten-order zip would do).
        def leaf(path, g, w):
            p = path_str(path)
            if is_quantizable(p, g, spec):
                acc[p] = acc.get(p, 0.0) + float(jnp.mean(jnp.abs(g * w)))
            return g

        jax.tree_util.tree_map_with_path(leaf, grads, params)
        count += 1
    return {k: v / max(count, 1) for k, v in acc.items()}


def assign_bits(
    param_sizes: Dict[str, int],
    sensitivities: Dict[str, float],
    target_mean_bits: float,
    allowed: Tuple[int, ...] = ALLOWED_BITS,
) -> Dict[str, int]:
    """Greedy budgeted assignment: path → bits with
    ``Σ n_l b_l / Σ n_l <= target_mean_bits``.

    Everyone starts at ``min(allowed)``; layers are upgraded one rung at a
    time in decreasing sensitivity order while the budget allows.
    """
    allowed = tuple(sorted(allowed))
    names = [n for n in param_sizes if n in sensitivities]
    total = sum(param_sizes[n] for n in names)
    if total == 0:
        return {}
    bits = {n: allowed[0] for n in names}
    budget = (target_mean_bits - allowed[0]) * total  # spare bit-volume

    # Most sensitive layers first, each upgraded as far as the remaining
    # budget allows — concentrates precision where the loss is sensitive
    # instead of spreading it evenly.
    for n in sorted(names, key=lambda x: -sensitivities[x]):
        for b in reversed(allowed):
            cost = param_sizes[n] * (b - bits[n])
            if cost <= budget + 1e-9:
                budget -= cost
                bits[n] = b
                break
    return bits
