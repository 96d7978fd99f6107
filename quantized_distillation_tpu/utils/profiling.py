"""Measurement + roofline harness for TPU kernels.

The tunneled-TPU environment defeats naive benchmarking three ways (all
observed, see .claude/skills/verify/SKILL.md):

1. ``block_until_ready`` doesn't synchronize through the relay → every
   measurement must end in a scalar readback.
2. Per-dispatch round-trip is ~40ms with tens-of-ms jitter → work must be
   iterated *inside* one program, and timing uses a two-point method
   (N_hi vs N_lo iterations, median over trials) so fixed overhead cancels.
3. XLA hoists loop-invariant bodies out of ``lax.scan`` → the iterated body
   must consume a value that depends on the previous iteration. ``measure``
   enforces this by passing the carry into the body.

``roofline`` reports achieved FLOP/s and HBM bandwidth against chip peaks —
the per-kernel verification the north-star demands.
"""

from __future__ import annotations

import statistics
import time
from dataclasses import dataclass
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

# Peak specs per chip generation (public numbers).
CHIP_PEAKS: Dict[str, Dict[str, float]] = {
    "v5e": {"bf16_tflops": 394.0, "int8_tops": 788.0, "hbm_gbs": 819.0},
    "v5p": {"bf16_tflops": 459.0, "int8_tops": 918.0, "hbm_gbs": 2765.0},
    "v4": {"bf16_tflops": 275.0, "int8_tops": 275.0, "hbm_gbs": 1228.0},
}


def detect_chip() -> str:
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "").lower()
    for key in ("v5 lite", "v5e"):
        if key in kind:
            return "v5e"
    if "v5" in kind:
        return "v5p"
    if "v4" in kind:
        return "v4"
    return "v5e"


def measure(
    body: Callable[[jnp.ndarray], jnp.ndarray],
    *,
    iters_lo: int = 100,
    iters_hi: int = 1100,
    trials: int = 5,
    min_delta_s: float = 0.25,
    max_iters: int = 1_000_000,
) -> float:
    """Seconds per iteration of ``body``.

    ``body(carry_scalar) -> scalar`` MUST thread the carry into its
    computation (e.g. perturb an input by ``carry * 0`` is NOT enough — use
    ``x + carry * eps`` or feed outputs forward) so the scan cannot be
    hoisted. Returns the median two-point estimate.

    Sub-~5us kernels at the default iteration counts put the two-point wall
    delta below the relay's tens-of-ms jitter and printed degenerate values
    (round-3 roofline note in BASELINE.md). The fix is automatic here: when
    the measured hi-lo delta is under ``min_delta_s``, the hi point is
    re-run with the iteration count scaled so the delta clears the jitter —
    the iteration bound is a RUNTIME argument of the one compiled program,
    so rescaling costs no recompile.
    """

    # One compiled program serves every iteration count (runtime while_loop
    # bound) — compiles cost ~50s each through the remote-compile hook.
    @jax.jit
    def g(n):
        def cond(s):
            return s[0] < n

        def step(s):
            return (s[0] + 1, body(s[1]))

        return jax.lax.while_loop(cond, step, (jnp.int32(0), jnp.float32(0.0)))[1]

    def run(iters):
        float(g(iters))  # compile (first call) + warm
        samples = []
        for _ in range(trials):
            t0 = time.perf_counter()
            float(g(iters))
            samples.append(time.perf_counter() - t0)
        return samples

    lo = run(iters_lo)
    hi = run(iters_hi)

    def estimate(hi_samples, hi_iters):
        return statistics.median(
            [
                (h - l) / (hi_iters - iters_lo)
                for h, l in zip(sorted(hi_samples), sorted(lo))
            ]
        )

    delta = statistics.median(hi) - statistics.median(lo)
    if delta < min_delta_s:
        per = max(estimate(hi, iters_hi), 1e-8)  # floor vs jitter-negative
        need = iters_lo + int(min_delta_s / per)
        new_hi = min(max(need, iters_hi), max_iters)
        if new_hi > iters_hi:
            hi, iters_hi = run(new_hi), new_hi
    return max(estimate(hi, iters_hi), 1e-9)


@dataclass
class RooflineResult:
    name: str
    seconds: float
    tflops: float
    gbs: float
    pct_compute: float
    pct_memory: float
    bound: str

    def line(self) -> str:
        return (
            f"{self.name}: {self.seconds*1e6:.0f} us | "
            f"{self.tflops:.1f} TFLOP/s ({self.pct_compute:.0f}% peak) | "
            f"{self.gbs:.0f} GB/s ({self.pct_memory:.0f}% peak) | {self.bound}-bound"
        )


def roofline(
    name: str,
    seconds: float,
    flops: float,
    bytes_moved: float,
    chip: Optional[str] = None,
) -> RooflineResult:
    peaks = CHIP_PEAKS[chip or detect_chip()]
    tf = flops / seconds / 1e12
    gb = bytes_moved / seconds / 1e9
    pc = 100.0 * tf / peaks["bf16_tflops"]
    pm = 100.0 * gb / peaks["hbm_gbs"]
    intensity = flops / max(bytes_moved, 1.0)
    ridge = peaks["bf16_tflops"] * 1e12 / (peaks["hbm_gbs"] * 1e9)
    return RooflineResult(
        name=name,
        seconds=seconds,
        tflops=tf,
        gbs=gb,
        pct_compute=pc,
        pct_memory=pm,
        bound="compute" if intensity > ridge else "memory",
    )


def trace(logdir: str):
    """``jax.profiler`` trace context: XPlane/Perfetto dump under ``logdir``.

    Usage::

        with trace("/tmp/qdt-trace"):
            state, m = train_step(state, batch, rng)
            jax.block_until_ready(m["loss"])

    View with TensorBoard's profile plugin or ui.perfetto.dev. This is the
    SURVEY §5 'tracing/profiling' subsystem (absent in the reference); the
    two-point ``measure`` above remains the right tool for wall-clock numbers
    through the tunneled-TPU relay (traces capture device time fine, but
    host timelines include the relay RTT).
    """
    return jax.profiler.trace(logdir)
