"""Fused dequant+matmul+top-k+logsumexp Pallas kernel for the generator.

The vocab projection dominates every beam-decode step: with the reference's
WMT13 setup (onmt generator Linear→softmax over ~32k target words, the
``onmt/Translator.py`` hot loop), a [B*K, V] float32 logits tensor is
materialized in HBM, re-read by log_softmax, and re-read again by top-k —
measured on v5e that bookkeeping costs 2-3x the *entire* rest of the decode
step. This kernel computes ``x @ dequant(W) + bias`` tile by tile and reduces
each tile **in VMEM** to the per-row statistics beam search actually needs:

- the top-k logits and their vocab indices (k = beam width, <= 8), and
- the row logsumexp (so callers get exact ``log_softmax = logit - lse``),

so the [M, V] logits never touch HBM: traffic per step drops from
``~3 * 4*M*V`` bytes to just the packed INT2/4/8 weight bytes.

Top-k selection is *lane-bucketed streaming top-s* (``slots`` per call,
default 2): vocab column ``c`` belongs to class ``c % 128`` (the TPU lane it
lands on) and the kernel keeps the ``slots`` largest entries per class in
VMEM scratch, merged across all tiles, then pops the global top-k from the
[M, slots*128] survivors at the last grid step. This is exact unless
> ``slots`` of the true top-k land in one lane class (slots=2, k=5:
P ≈ (k choose 3)/128² < 0.1% per row for random logits; slots=4: all five
must collide, P ≈ 128⁻⁴ ≈ 4e-9); the row maximum is ALWAYS exact, so greedy
decode is exact, and slots >= k is exact for any input.
``jax.lax.approx_max_k`` makes the same bounded-recall trade on TPU — here
it rides inside the matmul for free.

**Cross-kernel tie band (expected index divergence vs the plain path).**
Lane collisions are NOT the only reason this kernel's indices can differ
from ``dequant_matmul`` → ``lax.top_k``: this kernel folds the per-bucket
affine into the bf16 *weights* (``levels * scale``) while the plain kernel
folds it into the bf16 *activations*, so any two logits within a few bf16
ulps of each other (≈ 2·2⁻⁸ relative) can ORDER differently between the
two kernels. A caller comparing fused vs plain top-k index sets should
expect a tie band, not exactness: measured on a trained model at the
serving vocabulary (V=32k, beam 5, 4-bit — scripts/topk_divergence.py,
BASELINE.md round 3), 3.87% of rows differ in top-k *set* and 0.18% in
top-1, every one a certified numeric tie (top-k VALUE gap ≤ ~2⁻⁸ relative,
max 0.027 absolute; zero collision misses — slots=2 and slots=4 stats are
identical; end-to-end BLEU identical). The certificate does not flag these
because both orderings are exact w.r.t. their own rounding; with both
paths at ``compute_dtype=jnp.float32`` the band vanishes. The bound is
asserted by ``tests/test_kernels.py::TestCrossKernelNumerics``.

**Exactness certificate** (``certify=True``): the kernel also tracks, per
lane class, the largest value ever discarded from the kept set; a row's
top-k is PROVABLY exact when its k-th selected value strictly beats that
bound. The certificate makes the approximation *observable*: serving can
count certificate failures on live traffic instead of trusting a
distributional argument (measured rates live in BASELINE.md).

Logsumexp uses per-lane streaming max/sum-of-exp (flash-attention style)
merged across lanes at the end, and is exact to f32 rounding.

``dequant_matmul_topk_reference`` is the exact jnp golden model (dense
dequant → matmul → lax.top_k) used for tests and as the CPU fallback.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dequant_matmul import _dot_precision, _unpack_bucket, _vmem_limit_bytes
from .packed import BUCKET, PackedLinear, dequantize_linear

LANES = 128
KMAX = 8
NEG = -1e30


def _topk_kernel(
    x_ref,
    w_ref,
    st_ref,
    ot_ref,
    bias_ref,
    pts_ref,  # None when uniform (bound via partial)
    out_v,
    out_i,
    out_lse,
    out_cert,
    acc_a,
    acc_b,
    vs_s,
    is_s,
    se_s,
    disc_s,
    shift_s,
    *,
    bits,
    group,
    compute_dtype,
    n_true,
    k,
    n_steps,
    slots,
    lse_shift,
    select_dtype,
    certify,
    probe,
    pair,
    fold,
):
    """Inputs per grid step j:

    - ``x_ref`` [M, K] activations (f32), cast to ``compute_dtype`` ONCE per
      step (the per-bucket affine is folded into the *weights* instead:
      ``ws = levels * scale[:, b]`` is a [K, 256] VPU pass — 2.5x cheaper
      than the [M, 256] activation-side multiply when M > K),
    - ``st_ref``/``ot_ref`` [1, K, group] per-step scale/offset slabs
      (rearranged from the PackedLinear [nb, K] layout so bucket b is a
      static lane slice; 3-D because Mosaic lane blocks must be 128-wide or
      whole-dimension). The offset term ``Σ_k x[m,k]·o[b,k]`` for ALL
      buckets of the step is ONE [M,K]x[K,group] MXU dot instead of
      ``group`` VPU mul+reduce passes.

    The per-bucket loop is software-pipelined: bucket ``b``'s MXU dot is
    issued BEFORE bucket ``b-1``'s VPU select/lse stream, so Mosaic can run
    the systolic array and the vector unit concurrently. Round-5
    decomposition (``probe=`` modes, BASELINE.md): the overlap IS achieved
    — the MXU side alone measures at the dense floor (65.3 µs at the
    serving shape) and hides completely under the VPU stream (106.7 µs
    alone ≈ 105.3 full) — so kernel latency == VPU stream op count, which
    is what ``fold`` (offset into the weight tile; v-prep halves) and
    ``pair`` (one survivor update per bucket) attack.

    Index tracking streams the scalar CHUNK id (vocab = chunk*128 + lane,
    reconstructed at finalize) instead of a per-lane vocab-id vector, saving
    a VPU add per chunk.

    Scratch: ``vs_s``/``is_s`` [M, slots*128] hold the per-lane-class top-s
    survivors; ``disc_s`` [M, 128] the largest value each lane class ever
    discarded (the exactness-certificate bound). Logits tiles alternate
    between two [M, 256] scratches (pipeline depth 1) instead of the old
    [M, group*256] slab — ~9MB less VMEM at the serving shape.
    """
    j = pl.program_id(0)
    m = x_ref.shape[0]
    c = group * BUCKET
    bpb = BUCKET * bits // 8
    tpb = BUCKET // LANES  # 128-lane chunks per bucket

    @pl.when(j == 0)
    def _init():
        vs_s[:] = jnp.full((m, slots * LANES), NEG, select_dtype)
        is_s[:] = jnp.zeros((m, slots * LANES), jnp.int32)
        se_s[:] = jnp.zeros((m, LANES), jnp.float32)
        if certify:
            disc_s[:] = jnp.full((m, LANES), NEG, select_dtype)
        if probe == "nodots":
            # select stream alone: the tiles are never written — zero them
            # once so the stream consumes deterministic values
            acc_a[:] = jnp.zeros((m, BUCKET), jnp.float32)
            acc_b[:] = jnp.zeros((m, BUCKET), jnp.float32)

    x = x_ref[:]
    xc = x.astype(compute_dtype)
    slab_s = st_ref[0]  # [K, group] — this step's per-bucket scales
    slab_o = ot_ref[0]
    if fold:
        # round-5 "fold" restructuring: the per-bucket offset rides the MXU
        # dot itself — the affine folds FULLY into the weight tile
        # (ws = levels*scale + offset, one extra [K, 256] VPU add per
        # bucket over K=256 rows) — so the streamed chunk needs only the
        # bias add: per-chunk v-prep halves from 2 [M,128] ops to 1. This
        # matters because the kernel is VPU-stream-bound (round-5
        # decomposition: dots 65.3 us vs stream 106.7 vs full 105.3 — the
        # MXU is fully hidden under the stream). A first fold variant also
        # folded the BIAS as an extra weight row hit by a ones activation
        # column; the K+8-shaped dot measured 258 us (Mosaic pathology) and
        # was dropped — BASELINE round 5.
        off = None
    else:
        # offset term for every bucket of this step in one MXU dot:
        # [M, group]
        off = jnp.dot(
            x, slab_o,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def bucket_dot(b):
        # writes into one of TWO disjoint tile scratches (even/odd bucket):
        # an explicit double buffer so at most two logits tiles are resident
        # (value-passing tiles let the scheduler keep all `group` tiles
        # live → VMEM OOM), as separate refs so the scheduler can overlap
        # bucket b's MXU dot with bucket b-1's VPU select without aliasing
        # conservatism
        levels = _unpack_bucket(w_ref[:, b * bpb : (b + 1) * bpb], bits)
        if pts_ref is not None:
            vals = jnp.zeros(levels.shape, jnp.float32)
            for jj in range(1 << bits):
                vals = vals + jnp.where(levels == jj, pts_ref[jj], 0.0)
        else:
            vals = levels
        tgt = acc_a if b % 2 == 0 else acc_b
        if fold:
            ws = (
                vals * slab_s[:, b : b + 1] + slab_o[:, b : b + 1]
            ).astype(compute_dtype)
        else:
            ws = (vals * slab_s[:, b : b + 1]).astype(compute_dtype)
        tgt[:] = jnp.dot(
            xc, ws,
            preferred_element_type=jnp.float32,
            precision=_dot_precision(compute_dtype),
        )

    # running select state, loaded once per grid step: slot t's survivors
    # live at lane block t. (A round-4 `streams` knob split consecutive
    # chunks across independent survivor sets to shorten the serial
    # compare chain; it measured SLOWER everywhere — 173.0 vs 110.7 µs,
    # the extra live select state spills — and was deleted; BASELINE.md
    # round 4 keeps the record.)
    def blk(i):
        return slice(i * LANES, (i + 1) * LANES)

    vs = [vs_s[:, blk(t)] for t in range(slots)]
    iv = [is_s[:, blk(t)] for t in range(slots)]
    se = se_s[:]
    disc = disc_s[:] if certify else None
    # the row shift is stored lane-broadcast (Mosaic lane blocks must be
    # 128-wide); every lane carries the same value
    shift = shift_s[:] if (lse_shift or pair) else None
    mask_pad = n_true < n_steps * c
    lane = (
        jax.lax.broadcasted_iota(jnp.int32, (m, LANES), 1) if mask_pad else None
    )
    CLAMP = 70.0  # fixed-shift lse: exp arg cap (see dequant_matmul_topk)

    def select_bucket_pair(b):
        """Bucket-pair select (round-5 structural change): ONE survivor
        update per bucket instead of one per 128-lane chunk.

        The kernel is select/lse-STREAM-bound (measured round 5: dots-only
        65.3 µs ≈ the dense floor vs stream-only 106.7 µs — the MXU is
        fully hidden), so the lever is stream op count. Merging the
        bucket's two chunks with one pairwise max first halves the
        survivor-update work; the lse runs fixed-shift (the shift pinned
        from the row's first chunk, exp args clamped — same contract as
        ``lse_shift``). Exactness: survivor classes become (lane,
        bucket-pairwise-max) — a top-k element can now also be lost to a
        same-bucket same-lane rival, adding P ≈ C(k,2)/128² per row on
        random logits (same order as the slot-collision term); the row max
        stays exact (max of maxes) and the certificate stays sound because
        every pairwise LOSER feeds the discard bound.
        """
        nonlocal disc, shift, se
        tile_b = (acc_a if b % 2 == 0 else acc_b)[:]
        chunk0 = j * (c // LANES) + b * tpb  # scalar id of the even chunk
        if fold:
            # offset already rode the dot: only the bias add remains
            v0 = tile_b[:, :LANES] + bias_ref[:, (b * tpb) * LANES : (b * tpb + 1) * LANES]
            v1 = tile_b[:, LANES:] + bias_ref[:, (b * tpb + 1) * LANES : (b * tpb + 2) * LANES]
        else:
            off_b = off[:, b : b + 1]
            v0 = tile_b[:, :LANES] + (off_b + bias_ref[:, (b * tpb) * LANES : (b * tpb + 1) * LANES])
            v1 = tile_b[:, LANES:] + (off_b + bias_ref[:, (b * tpb + 1) * LANES : (b * tpb + 2) * LANES])
        if mask_pad:
            v0 = jnp.where(lane + chunk0 * LANES < n_true, v0, NEG)
            v1 = jnp.where(lane + (chunk0 + 1) * LANES < n_true, v1, NEG)
        if b == 0:
            # grid step 0 pins the row shift (a real logit of the row, so
            # the row sum-of-exp is always >= 1)
            shift = jnp.where(
                j == 0,
                jnp.broadcast_to(
                    jnp.max(v0, axis=1, keepdims=True), (m, LANES)
                ),
                shift,
            )
        se = (
            se
            + jnp.exp(jnp.minimum(v0 - shift, CLAMP))
            + jnp.exp(jnp.minimum(v1 - shift, CLAMP))
        )
        upd2 = v1 > v0
        vmax = jnp.maximum(v0, v1)
        ci = jnp.where(upd2, chunk0 + 1, chunk0)
        if certify:
            # the pairwise loser never enters the survivor set: bound it
            disc = jnp.maximum(disc, jnp.minimum(v0, v1).astype(select_dtype))
        vsel = vmax if select_dtype == jnp.float32 else vmax.astype(select_dtype)
        upd = vsel > vs[0]
        winner = jnp.maximum(vsel, vs[0])
        loser = jnp.minimum(vsel, vs[0])
        cur_i = jnp.where(upd, iv[0], ci)
        iv[0] = jnp.where(upd, ci, iv[0])
        vs[0] = winner
        cur_v = loser
        for s_ in range(1, slots):
            u = cur_v > vs[s_]
            nv = jnp.maximum(cur_v, vs[s_])
            ni = jnp.where(u, cur_i, iv[s_])
            cur_v = jnp.minimum(cur_v, vs[s_])
            cur_i = jnp.where(u, iv[s_], cur_i)
            vs[s_], iv[s_] = nv, ni
        if certify:
            disc = jnp.maximum(disc, cur_v)

    def select_bucket(b):
        nonlocal disc, shift, se
        tile_b = (acc_a if b % 2 == 0 else acc_b)[:]
        off_b = off[:, b : b + 1] if not fold else None
        for tt in range(tpb):
            chunk = j * (c // LANES) + b * tpb + tt  # global chunk id (scalar)
            if fold:
                # offset already rode the dot: only the bias add remains
                v = (
                    tile_b[:, tt * LANES : (tt + 1) * LANES]
                    + bias_ref[:, (b * tpb + tt) * LANES : (b * tpb + tt + 1) * LANES]
                )
            else:
                v = tile_b[:, tt * LANES : (tt + 1) * LANES] + (
                    off_b + bias_ref[:, (b * tpb + tt) * LANES : (b * tpb + tt + 1) * LANES]
                )
            if mask_pad:
                # grid padding: edge-padded duplicate columns must not win
                # top-k or inflate the logsumexp. Static branch — skipped
                # when the caller neg-bias-masked the padding instead (see
                # serve.sharded.pack_generator_sharded).
                v = jnp.where(lane + chunk * LANES < n_true, v, NEG)
            if probe == "noselect":
                # decomposition probe: dots + the cheapest possible
                # consumption (one running max per chunk keeps every tile
                # live — Mosaic cannot dead-store the dot) and NOTHING else:
                # no lse, no indices, no ripple. The measured time is the
                # MXU/dequant side of the kernel in isolation.
                vs[0] = jnp.maximum(vs[0], v.astype(select_dtype))
                continue
            if probe == "lseonly":
                # stream decomposition: ONLY the logsumexp accumulation.
                # The fixed-shift flavor is select-independent; the
                # streaming-max flavor needs its own running max here.
                if lse_shift:
                    if b == 0 and tt == 0:
                        shift = jnp.where(
                            j == 0,
                            jnp.broadcast_to(
                                jnp.max(v, axis=1, keepdims=True), (m, LANES)
                            ),
                            shift,
                        )
                    se = se + jnp.exp(jnp.minimum(v - shift, CLAMP))
                else:
                    upd = v > vs[0]
                    winner = jnp.maximum(v, vs[0])
                    e = jnp.exp(jnp.minimum(v, vs[0]) - winner)
                    se = se * jnp.where(upd, e, 1.0) + jnp.where(upd, 1.0, e)
                    vs[0] = winner.astype(select_dtype)
                continue
            if lse_shift and b == 0 and tt == 0:
                # grid step 0's first chunk pins the row shift (a real logit
                # of the row, so the row sum-of-exp is always >= 1)
                shift = jnp.where(
                    j == 0,
                    jnp.broadcast_to(
                        jnp.max(v, axis=1, keepdims=True), (m, LANES)
                    ),
                    shift,
                )
            # the select stream may run narrower than f32 (select_dtype):
            # compares/ripple in bf16 halve vector-register pressure; the
            # lse always consumes the f32 logits
            vsel = v if select_dtype == jnp.float32 else v.astype(select_dtype)
            upd = vsel > vs[0]
            winner = jnp.maximum(vsel, vs[0])
            loser = jnp.minimum(vsel, vs[0])
            if probe == "nolse":
                pass  # stream decomposition: select/ripple without the lse
            elif lse_shift:
                # fixed-shift streaming sum: no rescale selects, and the
                # se chain is a bare add (shorter critical path)
                se = se + jnp.exp(jnp.minimum(v - shift, CLAMP))  # noqa: F823
            else:
                # slot 0 doubles as the per-lane max for the streaming
                # logsumexp: loser - winner, so ONE exp covers both branches:
                #   upd:   se*exp(old_max - new_max) + exp(0)      = se*e + 1
                #   !upd:  se*exp(0)                + exp(v - max) = se + e
                e = jnp.exp(loser - winner)
                se = se * jnp.where(upd, e, 1.0) + jnp.where(upd, 1.0, e)
            cur_i = jnp.where(upd, iv[0], chunk)
            iv[0] = jnp.where(upd, chunk, iv[0])
            vs[0] = winner
            cur_v = loser
            # the displaced value ripples down the remaining slots
            for s_ in range(1, slots):
                u = cur_v > vs[s_]
                nv = jnp.maximum(cur_v, vs[s_])
                ni = jnp.where(u, cur_i, iv[s_])
                cur_v = jnp.minimum(cur_v, vs[s_])
                cur_i = jnp.where(u, iv[s_], cur_i)
                vs[s_], iv[s_] = nv, ni
            # cur_v fell out of the kept set: certificate bound (when off,
            # the dangling cur_v/cur_i of the last ripple are dead code)
            if certify:
                disc = jnp.maximum(disc, cur_v)

    sel = select_bucket_pair if (pair and probe is None) else select_bucket
    if probe == "nodots":
        # decomposition probe: the select/lse stream alone, consuming the
        # zeroed tiles — no MXU dots, no dequant
        stream = select_bucket_pair if pair else select_bucket
        for b in range(group):
            stream(b)
    else:
        # software pipeline: issue dot(b) on the MXU, then stream
        # select(b-1) on the VPU while it runs
        bucket_dot(0)
        for b in range(1, group):
            bucket_dot(b)
            sel(b - 1)
        sel(group - 1)

    for t in range(slots):
        vs_s[:, blk(t)] = vs[t]
        is_s[:, blk(t)] = iv[t]
    se_s[:] = se
    if certify:
        disc_s[:] = disc
    if lse_shift or pair:
        shift_s[:] = shift

    # ---- last step: pop global top-k from the [M, slots*128]
    # survivor union
    @pl.when(j == n_steps - 1)
    def _finalize():
        # finalize runs in f32 regardless of select_dtype (a [M, wide] bf16
        # eq-compare trips a Mosaic relayout bug, and the pop loop is a
        # once-per-call cost); bf16 survivors keep their rounded values
        cand = jnp.concatenate(vs, axis=1).astype(jnp.float32)
        width = slots * LANES
        pos_iota = jax.lax.broadcasted_iota(jnp.int32, (m, width), 1)
        # survivors carry chunk ids; vocab id = chunk*128 + lane class
        cidx = jnp.concatenate(iv, axis=1) * LANES + pos_iota % LANES
        out_lane = jax.lax.broadcasted_iota(jnp.int32, (m, LANES), 1)
        buf_v = jnp.full((m, LANES), NEG, jnp.float32)
        buf_i = jnp.zeros((m, LANES), jnp.int32)
        kth = jnp.full((m, 1), NEG, jnp.float32)
        for t in range(k):
            mx = jnp.max(cand, axis=1, keepdims=True)  # [M, 1]
            pos = jnp.min(
                jnp.where(cand == mx, pos_iota, width), axis=1, keepdims=True
            )
            sel = pos_iota == pos
            idx_t = jnp.sum(jnp.where(sel, cidx, 0), axis=1, keepdims=True)
            buf_v = jnp.where(out_lane == t, mx, buf_v)
            buf_i = jnp.where(out_lane == t, idx_t, buf_i)
            cand = jnp.where(sel, NEG, cand)
            kth = mx  # after the loop: the k-th (smallest selected) value
        out_v[:] = buf_v
        out_i[:] = buf_i
        # certificate: the row's top-k is PROVABLY exact when even the best
        # discarded value could not have displaced the k-th selection
        if certify:
            row_disc = jnp.max(
                disc.astype(jnp.float32), axis=1, keepdims=True
            )  # [M, 1]
            out_cert[:] = jnp.broadcast_to(
                (kth > row_disc).astype(jnp.int32), (m, LANES)
            )
        else:
            out_cert[:] = jnp.zeros((m, LANES), jnp.int32)
        if lse_shift or pair:
            out_lse[:] = jnp.broadcast_to(
                shift + jnp.log(jnp.sum(se, axis=1, keepdims=True)), (m, LANES)
            )
        else:
            # exact lse: per-lane (max, sumexp) -> row
            row_m = jnp.max(vs[0].astype(jnp.float32), axis=1, keepdims=True)
            total = jnp.sum(
                se * jnp.exp(vs[0].astype(jnp.float32) - row_m),
                axis=1, keepdims=True,
            )
            out_lse[:] = jnp.broadcast_to(row_m + jnp.log(total), (m, LANES))


def _sublane(dtype) -> int:
    return 16 if dtype == jnp.bfloat16 else 8


def pick_generator_group(
    rows: int, budget_bytes: int = 48 * 1024 * 1024, max_group: int = 32
) -> int:
    """Largest power-of-two buckets-per-grid-step under a VMEM-cost model.

    Round-4 STEP-LEVEL sweep at the serving shape (M=640): group 8 =
    676.6k, 16 = 731.4k, 32 = 748.7k tokens/s — 32 wins at the full decode
    step. The cost model carries a rows term beyond the rows x group
    product: ``rows_padded * (group + 16) * 1024`` bytes, now fitted to
    THREE measured anchors (round 5, 48 MB scoped limit): 640x32 =
    31.5 MB fits; 1280x16 = 41.9 MB fits at 48 MB (compile-OOM'd the old
    32 MB — raising the limit was round-4 verdict item 6) and measures
    730.9k tokens/s vs 706.5k at group 8; 1280x32 = 62.9 MB OOMs even at
    48 MB. Budget = the kernel's 48 MB default scoped limit
    (``_vmem_limit_bytes``), so B=256 now picks group 16.

    The model uses the PADDED row count (the kernel pads rows to the f32
    sublane of 8). Note low-bit packing can still override the pick upward:
    ``packed.bucket_group`` clamps 2-bit groups to >= 2 so a group spans
    whole bytes."""
    rows_padded = -(-rows // _sublane(jnp.float32)) * _sublane(jnp.float32)
    group = max_group
    while group > 1 and rows_padded * (group + 16) * BUCKET * 4 > budget_bytes:
        group //= 2
    return group


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "compute_dtype", "interpret", "use_pallas", "slots",
        "lse_shift", "select_dtype", "certify", "probe", "pair", "fold",
    ),
)
def dequant_matmul_topk(
    x: jnp.ndarray,
    p: PackedLinear,
    k: int,
    *,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    use_pallas: bool = True,
    slots: int = 2,
    lse_shift: bool = False,
    select_dtype=jnp.float32,
    certify: bool = False,
    probe: Optional[str] = None,
    pair: bool = False,
    fold: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """x [M, K] @ dequant(p) [K, N] + bias → (top-k values [M, k] f32,
    indices [M, k] i32, logsumexp [M, 1] f32) without materializing logits.

    ``k <= 8``. ``slots`` survivors are kept per lane class (2 = fastest,
    ``slots >= k`` = mathematically exact for any input). With
    ``certify=True`` a 4th output [M, 1] int32 is returned: 1 where the
    row's top-k is provably exact (k-th value beats every discarded value).
    Falls back to the exact jnp reference when ``use_pallas`` is False
    (CPU path).

    Latency knobs (identical selection semantics, A/B via
    scripts/kernel_probe.py):

    - ``lse_shift``: replace the streaming-max logsumexp rescale with a
      fixed per-row shift pinned from the row's first 128 logits. The sum
      of exps is then always >= 1 (the shift is itself a row logit), so no
      underflow; exp args are clamped at +70, so rows whose logit SPREAD
      exceeds ~70 above the first-chunk max saturate the lse (top-k is
      unaffected) — impossible for softmax-trained generators, documented
      for adversarial inputs. Within that bound the result is f32-accurate
      like the streaming path.
    - ``select_dtype=jnp.bfloat16``: run the top-k compare/ripple stream in
      bf16 (the lse keeps the f32 logits; requires ``lse_shift``). Returned
      top-k VALUES are bf16-rounded and index choices can differ from f32
      on within-ulp ties — the same tie band the cross-kernel contract
      documents; the certificate stays sound (ties collapse to equality
      and the strict kth > disc test flags them). NOTE: v5e Mosaic rejects
      bf16 vector compares ("Target does not support this comparison",
      measured round 4), so this knob currently only runs in interpret
      mode / on TPU generations with native bf16 compare — kept for them,
      semantics locked by tests.

    A round-4 ``streams`` knob (independent survivor sets per chunk stride)
    measured slower everywhere and was deleted; BASELINE.md round 4 holds
    the record.

    ``probe`` (MEASUREMENT ONLY — outputs are garbage): ``"noselect"`` runs
    the dequant+MXU side with a 1-op/chunk consumption and no select/lse;
    ``"nodots"`` runs the select/lse stream over zeroed tiles with no MXU
    work; ``"nolse"`` keeps the full select/ripple but drops the lse
    accumulation; ``"lseonly"`` keeps only the lse accumulation. Together
    they decompose the kernel's MXU/VPU split, the stream's select-vs-lse
    split, and the overlap factor on real hardware
    (scripts/kernel_probe.py --probe ...). Round-5 measurement: the stream
    BOUNDS the kernel (dots 65.3 us vs stream 106.7 vs full 105.3 at the
    serving shape) — MXU work is fully hidden; thin the stream to go
    faster.
    """
    if k > KMAX:
        raise ValueError(f"fused top-k supports k <= {KMAX}, got {k}")
    if not 1 <= slots <= KMAX:
        raise ValueError(f"slots must be in [1, {KMAX}], got {slots}")
    if select_dtype not in (jnp.float32, jnp.bfloat16):
        raise ValueError(f"select_dtype must be f32 or bf16, got {select_dtype}")
    if select_dtype == jnp.bfloat16 and not lse_shift:
        raise ValueError("select_dtype=bf16 requires lse_shift (the "
                         "streaming-max lse would inherit bf16 error)")
    if probe not in (None, "noselect", "nodots", "nolse", "lseonly"):
        raise ValueError(f"unknown probe mode {probe!r}")
    if pair and probe in ("nolse", "lseonly"):
        raise ValueError("probe nolse/lseonly decompose the chunk stream; "
                         "use probe='nodots' with pair")
    if not use_pallas:
        ref = dequant_matmul_topk_reference(x, p, k, compute_dtype=compute_dtype)
        if certify:
            return ref + (jnp.ones((x.shape[0], 1), jnp.int32),)
        return ref
    m, kk = x.shape
    if kk != p.shape[0]:
        raise ValueError(f"x K={kk} vs packed K={p.shape[0]}")
    npad = p.n_padded
    n_true = p.shape[1]
    f = 8 // p.bits
    # bf16 select scratches need the 16-sublane tile; f32 needs 8
    tm = _sublane(select_dtype)
    mpad = -(-m // tm) * tm
    xp = jnp.pad(x, ((0, mpad - m), (0, 0))) if mpad != m else x
    bias = p.bias if p.bias is not None else jnp.zeros((n_true,), jnp.float32)
    bias_pad = jnp.pad(bias.astype(jnp.float32), (0, npad - n_true))[None, :]

    bg = p.group
    nb = npad // BUCKET
    if nb % bg:
        raise ValueError(f"buckets {nb} not divisible by group {bg}")
    n_steps = nb // bg
    c = bg * BUCKET
    group_bytes = c // f
    # scale/offset rearranged to [n_steps, K, group]: the kernel reads
    # bucket b of step j as a static lane slice of the step's [K, group]
    # slab (weight-side affine fold + one-dot offset term). 3-D so the
    # per-step block equals the full trailing dims — Mosaic requires lane
    # blocks of 128 or whole-dimension, and group < 128.
    st3 = p.scale.reshape(n_steps, bg, kk).transpose(0, 2, 1)
    ot3 = p.offset.reshape(n_steps, bg, kk).transpose(0, 2, 1)
    in_specs = [
        pl.BlockSpec((mpad, kk), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((kk, group_bytes), lambda j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kk, bg), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kk, bg), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda j: (0, j), memory_space=pltpu.VMEM),
    ]
    operands = [xp, p.packed, st3, ot3, bias_pad]
    static_kw = dict(
        bits=p.bits,
        group=bg,
        compute_dtype=compute_dtype,
        n_true=n_true,
        k=k,
        n_steps=n_steps,
        slots=slots,
        lse_shift=lse_shift,
        select_dtype=select_dtype,
        certify=certify,
        probe=probe,
        pair=pair,
        fold=fold,
    )
    if p.points is not None:
        # pts_ref arrives as the 6th input ref, matching _topk_kernel's slot
        in_specs.append(
            pl.BlockSpec((1 << p.bits,), lambda j: (0,), memory_space=pltpu.SMEM)
        )
        operands.append(p.points)
        kernel = functools.partial(_topk_kernel, **static_kw)
    else:
        kernel = functools.partial(_with_none_points, **static_kw)
    out_shape = [
        jax.ShapeDtypeStruct((mpad, LANES), jnp.float32),
        jax.ShapeDtypeStruct((mpad, LANES), jnp.int32),
        jax.ShapeDtypeStruct((mpad, LANES), jnp.float32),
        jax.ShapeDtypeStruct((mpad, LANES), jnp.int32),
    ]
    out_specs = [
        pl.BlockSpec((mpad, LANES), lambda j: (0, 0), memory_space=pltpu.VMEM)
        for _ in range(4)
    ]
    scratch = [
        pltpu.VMEM((mpad, BUCKET), jnp.float32),  # even-bucket logits tile
        pltpu.VMEM((mpad, BUCKET), jnp.float32),  # odd-bucket logits tile
        pltpu.VMEM((mpad, slots * LANES), select_dtype),  # top-s values
        pltpu.VMEM((mpad, slots * LANES), jnp.int32),  # top-s chunk ids
        pltpu.VMEM((mpad, LANES), jnp.float32),  # sum-exp
        pltpu.VMEM((mpad, LANES), select_dtype),  # discard (certificate)
        pltpu.VMEM((mpad, LANES), jnp.float32),  # lse row shift (lane-bcast)
    ]
    flops = 2 * mpad * kk * npad
    vals, idx, lse, cert = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=xp.size * 4 + p.packed.size + 8 * p.scale.size,
            transcendentals=mpad * npad,
        ),
        # Mosaic's default scoped-VMEM limit is 16MB; v5e has far more
        # physical VMEM, and the pipelined body (2-deep tile rotation +
        # survivors + temporaries) peaks just above the default at the
        # serving shape. 32MB (default; see _vmem_limit_bytes) keeps
        # generous headroom on the hardware.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes()
        ),
        interpret=interpret,
    )(*operands)
    out = (vals[:m, :k], idx[:m, :k], lse[:m, :1])
    if certify:
        out = out + (cert[:m, :1],)
    return out


def _with_none_points(x_ref, w_ref, s_ref, o_ref, bias_ref, *rest, **kw):
    """Uniform-grid variant: pts_ref slot is absent from the operand list."""
    _topk_kernel(x_ref, w_ref, s_ref, o_ref, bias_ref, None, *rest, **kw)


def dequant_matmul_topk_reference(
    x: jnp.ndarray,
    p: PackedLinear,
    k: int,
    *,
    compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact golden path: dense dequant → matmul → lax.top_k + logsumexp."""
    w = dequantize_linear(p, dtype=compute_dtype)
    logits = jnp.dot(
        x.astype(compute_dtype), w, preferred_element_type=jnp.float32
    )
    if p.bias is not None:
        logits = logits + p.bias
    vals, idx = jax.lax.top_k(logits, k)
    lse = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
    return vals, idx.astype(jnp.int32), lse
