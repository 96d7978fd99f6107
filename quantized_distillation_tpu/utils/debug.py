"""Numeric sanitizers and determinism checks.

The reference is a single-threaded torch script with no sanitizers
(SURVEY.md §5: race detection / sanitizers — absent). The TPU-native
equivalents of that row are numeric, not thread-based: everything runs under
``jit``, so the failure modes worth guarding are NaN/Inf escapes and
nondeterministic compilations, and the tools are ``jax.experimental.checkify``
plus deterministic-seed reruns.

- :func:`find_nonfinite` — host-side sweep of any pytree, names offending
  leaves (use on params/grads/metrics after a bad step).
- :func:`checked` — wrap a jitted function with checkify's float checks
  (NaN/Inf produced anywhere inside, division, OOB indexing); returns a
  wrapped fn that raises ``JaxRuntimeError`` with the original trace point.
- :func:`assert_deterministic` — run a function twice on identical inputs
  and assert bitwise-equal outputs (catches nondeterministic reductions or
  accidental host randomness inside a step).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import checkify

PyTree = Any


def find_nonfinite(tree: PyTree, prefix: str = "") -> List[str]:
    """Names of leaves containing NaN/Inf (host-side; forces transfer)."""
    bad: List[str] = []

    def visit(path, leaf):
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            name = "/".join(
                str(getattr(p, "key", getattr(p, "idx", p))) for p in path
            )
            bad.append(f"{prefix}{name}")
        return leaf

    jax.tree_util.tree_map_with_path(visit, tree)
    return bad


def checked(fn: Callable, *, jit: bool = True) -> Callable:
    """checkify-wrap ``fn`` with float/div/OOB error sets; raises on error.

    The checks compile INTO the program (cheap VPU predicates), so this can
    wrap the real train step during debugging sessions, unlike host-side
    sweeps which force a device sync per call.
    """
    errs = checkify.float_checks | checkify.div_checks | checkify.index_checks
    cf = checkify.checkify(fn, errors=errs)
    if jit:
        cf = jax.jit(cf)

    def run(*args, **kwargs):
        err, out = cf(*args, **kwargs)
        checkify.check_error(err)  # raises JaxRuntimeError with trace point
        return out

    return run


def assert_deterministic(
    fn: Callable, *args, runs: int = 2, **kwargs
) -> None:
    """Run ``fn`` ``runs`` times on identical inputs; assert bitwise equality.

    Catches nondeterministic reductions, uncaptured host randomness, or
    donation bugs that let a later run observe mutated inputs.
    """
    outs = []
    for _ in range(runs):
        out = fn(*args, **kwargs)
        outs.append(jax.tree.map(lambda x: np.asarray(x).copy(), out))
    ref = outs[0]
    for i, other in enumerate(outs[1:], start=2):
        mism: List[Tuple[str, float]] = []

        def cmp(path, a, b):
            if not np.array_equal(np.asarray(a), np.asarray(b), equal_nan=True):
                name = "/".join(
                    str(getattr(p, "key", getattr(p, "idx", p))) for p in path
                )
                mism.append((name, float(np.max(np.abs(np.asarray(a) - np.asarray(b))))))
            return a

        jax.tree_util.tree_map_with_path(cmp, ref, other)
        if mism:
            raise AssertionError(
                f"run {i} differs from run 1 at {len(mism)} leaves: {mism[:5]}"
            )


def grad_health(grads: PyTree) -> Dict[str, float]:
    """Summary stats for a gradient pytree (norm, max, nonfinite count)."""
    leaves = [jnp.asarray(g) for g in jax.tree.leaves(grads)]
    if not leaves:
        return {"norm": 0.0, "max_abs": 0.0, "nonfinite": 0.0}
    sq = sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves)
    mx = max(jnp.max(jnp.abs(g)) for g in leaves)
    nf = sum(jnp.sum(~jnp.isfinite(g.astype(jnp.float32))) for g in leaves)
    return {
        "norm": float(jnp.sqrt(sq)),
        "max_abs": float(mx),
        "nonfinite": float(nf),
    }
