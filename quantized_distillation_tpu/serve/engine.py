"""Continuous-batching beam-search serving engine.

Replaces the reference's offline translate loop (``onmt/Translator.py``
processed one fixed batch to completion) with slot-based continuous batching
(north-star config 5): a fixed grid of ``max_slots`` sentences x ``beam_size``
beams decodes in lockstep inside ONE jitted step program; sentences join and
leave per step without recompilation.

Design (ragged lifetimes x fixed-shape jit — SURVEY.md §7 hard part 2):

- All decode state lives in preallocated device arrays: the decoder-state
  pytree ([S*K, ...] — the LSTM (c,h)/input-feed "KV-cache" analog), encoder
  outputs/keys/masks, and beam bookkeeping ([S, K] scores/finished/lengths,
  [S, K, T_max] backpointer histories — sym/parent, reconstructed to token
  rows only for finished slots). These are what the sharding rules
  tensor-shard.
- Each slot sits at its own decode depth: ``step_beams`` takes a per-slot
  ``t`` vector; inactive slots are masked back to their previous state.
- Admission is BATCHED: up to ``admit_batch`` queued sentences are encoded
  in one jitted dispatch and scattered into their slots by one jitted
  ``insert_many`` (scatter with ``mode='drop'`` — padding entries carry an
  out-of-bounds slot sentinel and vanish), so admitting A sentences costs 2
  dispatches, not 2A.
- Stepping is CHUNKED: one dispatch advances every slot ``chunk_steps``
  times inside a ``lax.scan`` (slots that finish mid-chunk are masked
  frozen), and the host reads back the tiny [S] done-flags once per chunk.
  All math stays on device; the host only does queue/slot bookkeeping.

The engine is backend-agnostic over the decode step: it drives the packed
Pallas inference path (:mod:`.infer`) in production and the flax path in
tests.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ServeConfig
from ..data.translation import BOS, EOS, PAD
from .beam import (
    NEG_INF,
    PARENT_DTYPE,
    BeamState,
    coverage_penalty,
    length_penalty,
    reconstruct_tokens,
    step_beams,
    step_beams_cand,
    unroll_ring,
)

PyTree = Any


@dataclass
class Completion:
    request_id: int
    tokens: np.ndarray  # best beam token row [T_max] (PAD-trimmed by caller)
    score: float
    # populated when cfg.beam.n_best > 1 (reference onmt/Translator.py n-best):
    nbest_tokens: Optional[np.ndarray] = None  # [n_best, T_max], best first
    nbest_scores: Optional[np.ndarray] = None  # [n_best]


class TranslationEngine:
    """Host-side orchestrator around the jitted slot-grid programs."""

    def __init__(
        self,
        model,
        variables: PyTree,
        cfg: ServeConfig,
        packed_decoder=None,
        mesh=None,
    ):
        """``mesh`` (with a vocab-sharded ``packed_decoder`` from
        :func:`.sharded.shard_decoder`) serves the slot grid tensor-sharded:
        slot rows over ``data``, the generator over ``model`` (see
        :mod:`.sharded`). ``cfg.max_slots`` must divide the data axis."""
        self.model = model
        self.variables = variables
        self.cfg = cfg
        self.dec = packed_decoder
        self.mesh = mesh
        # GNMT coverage penalty (reference onmt/Beam.py GlobalScorer): the
        # grid carries a [S, K, T_src] attention-mass accumulator, reset on
        # admission like scores/lengths and gathered by parent in the beam
        # core; the penalty applies at extraction. Costs one row-sharded
        # accumulate riding the existing attention — no extra collective.
        self._cov = cfg.beam.coverage_penalty != 0.0
        if mesh is not None:
            from ..parallel.mesh import DATA_AXIS

            dp = mesh.shape[DATA_AXIS]
            if cfg.max_slots % dp:
                raise ValueError(
                    f"max_slots {cfg.max_slots} must divide data axis {dp}"
                )
        self._next_id = 0
        self._poisoned = False  # set by drive_chunks(force_active=True)
        self._queue: List[Tuple[int, np.ndarray, int]] = []
        # Admit-ahead staging (cfg.stage_ahead): encoded-but-not-admitted
        # admission batches. Each entry holds the device tensors of one
        # encode dispatch plus the (row, request_id) pairs still waiting for
        # a slot — a batch can be admitted PARTIALLY (rows not taken this
        # round scatter to the out-of-bounds sentinel and are dropped).
        self._staged: List[Dict[str, Any]] = []
        self._slot_req: List[Optional[int]] = [None] * cfg.max_slots
        self._slot_t = np.zeros(cfg.max_slots, np.int32)
        # Ring-buffer histories: every slot writes at ONE shared scalar ring
        # position per global inner step (a dynamic-update-slice, O(S*K) per
        # step — no per-slot scatter, no t_max scaling). A slot's history is
        # the contiguous ring window starting at its admission position;
        # headroom covers the steps a finished slot can sit before its
        # same-chunk extraction (plus bench drive_chunks chunk sizes).
        self._chunk_cap = max(64, cfg.chunk_steps, cfg.chunk_steps_busy or 0)
        self._t_hist = cfg.max_tgt_len + self._chunk_cap
        self._slot_g0 = np.zeros(cfg.max_slots, np.int32)  # admission ring pos
        self._results: List[Completion] = []
        self.steps_run = 0
        self.tokens_emitted = 0
        self._build()

    # ---- jitted programs ----
    def _build(self):
        cfg = self.cfg
        s, k = cfg.max_slots, cfg.beam.beam_size
        t_src, t_max = cfg.max_src_len, cfg.max_tgt_len
        model, variables, dec = self.model, self.variables, self.dec

        from .infer import KMAX

        mesh = self.mesh
        cov = self._cov
        use_cand = dec is not None and k <= KMAX
        if dec is not None and mesh is not None:
            if not use_cand:
                raise ValueError(
                    f"sharded serving requires beam_size <= {KMAX}"
                )
            from .infer import encode_packed
            from .sharded import make_sharded_decode_step_topk

            def encode(src, src_len):
                return encode_packed(model, variables, dec, src, src_len)

            _sh_step = make_sharded_decode_step_topk(
                dec, mesh, k, with_align=cov
            )

            def decode_step(enc_keys, enc_out, enc_mask, st, tokens):
                return _sh_step(st, tokens, enc_keys, enc_out, enc_mask)

        elif dec is not None:
            from .infer import (
                encode_packed,
                packed_decode_step,
                packed_decode_step_topk,
            )

            def encode(src, src_len):
                keys, enc_out, enc_mask, st = encode_packed(
                    model, variables, dec, src, src_len
                )
                return keys, enc_out, enc_mask, st

            if use_cand:
                # fused dequant+matmul+top-k generator: the beam core
                # consumes per-beam candidates, never [S*K, V] logits
                def decode_step(enc_keys, enc_out, enc_mask, st, tokens):
                    return packed_decode_step_topk(
                        dec, st, tokens, enc_keys, enc_out, enc_mask, k,
                        with_align=cov,
                    )

            else:

                def decode_step(enc_keys, enc_out, enc_mask, st, tokens):
                    return packed_decode_step(
                        dec, st, tokens, enc_keys, enc_out, enc_mask,
                        with_align=cov,
                    )

        else:

            def encode(src, src_len):
                enc_out, enc_mask, st = model.apply(
                    variables, src, src_len, method=model.encode
                )
                return enc_out, enc_out, enc_mask, st

            def decode_step(enc_keys, enc_out, enc_mask, st, tokens):
                # flax fallback: the model's attention expects row-expanded
                # enc tensors; the grid stores them per-slot (the packed
                # path folds beams itself), so expand here
                return model.apply(
                    variables, st, tokens,
                    jnp.repeat(enc_out, k, axis=0),
                    jnp.repeat(enc_mask, k, axis=0),
                    method=(model.decode_step_attn if cov else model.decode_step),
                )

        self._encode = jax.jit(encode)

        def one_step(grid, pos, t_vec, active):
            enc_keys, enc_out, enc_mask, beam = grid

            def ds(st, tokens):
                return decode_step(enc_keys, enc_out, enc_mask, st, tokens)

            stepper = step_beams_cand if use_cand else step_beams
            step_kw = {}
            if use_cand and dec.use_pallas and mesh is None:
                # fused pallas beam-combine (single-chip only: under a mesh
                # the combine would need to live inside the shard_map'd
                # step; the lax.top_k path partitions fine) — interleaved
                # A/B 857.8k vs 831.1k tokens/s, BASELINE round 5
                step_kw["combine"] = "pallas"
            # every slot writes its history at the SAME scalar ring position
            # `pos` — O(S*K) per step regardless of t_max (backpointer ring,
            # VERDICT round-3 item 1); inactive slots' rows at `pos` are
            # outside every live window, so no history merge is needed
            new_beam = stepper(
                ds, beam, pos, beam_size=k, eos_id=EOS, pad_id=PAD, **step_kw
            )
            # Inactive slots keep their previous SMALL state untouched: the
            # post-done stepper would permute a finished slot's beams (its
            # equal-score EOS continuations re-sort), desyncing scores from
            # the history the extraction backtrace pairs them with. The
            # decoder-state pytree is NOT merged — an inactive slot's state
            # is garbage until admission resets it, and the [S*K, H] merge
            # was measurable per-step HBM traffic.
            row = active[:, None]
            merged = BeamState(
                decoder_state=new_beam.decoder_state,
                sym=new_beam.sym,
                parent=new_beam.parent,
                last_token=jnp.where(row, new_beam.last_token, beam.last_token),
                scores=jnp.where(row, new_beam.scores, beam.scores),
                finished=jnp.where(row, new_beam.finished, beam.finished),
                lengths=jnp.where(row, new_beam.lengths, beam.lengths),
                coverage=(
                    None
                    if beam.coverage is None
                    else jnp.where(
                        row[..., None], new_beam.coverage, beam.coverage
                    )
                ),
            )
            done = active & (
                jnp.all(merged.finished, axis=1) | (t_vec + 1 >= t_max)
            )
            return (enc_keys, enc_out, enc_mask, merged), done

        t_hist = self._t_hist

        def step_chunk(grid, t_vec, active, n_inner, g0):
            # n_inner is a RUNTIME value (while_loop): one compiled program
            # serves every chunk length, so the host can adapt chunk size to
            # queue pressure (shorter chunks while work is waiting → less
            # slot-time stranded between a mid-chunk completion and the next
            # admission) without recompiling. ``g0`` is the global inner-
            # step counter at chunk start (mod t_hist) — the shared ring
            # write position advances with it.
            def cond(c):
                return c[0] < n_inner

            def body(c):
                i, grid, t_vec, active, done_acc, emitted = c
                pos = jax.lax.rem(g0 + i, jnp.int32(t_hist))
                grid, done = one_step(grid, pos, t_vec, active)
                emitted = emitted + jnp.sum(active.astype(jnp.int32))
                t_vec = t_vec + active.astype(t_vec.dtype)
                done_acc = done_acc | done
                active = active & ~done
                return (i + 1, grid, t_vec, active, done_acc, emitted)

            init = (
                jnp.int32(0), grid, t_vec, active,
                jnp.zeros_like(active), jnp.int32(0),
            )
            _, grid, t_vec, active, done_acc, emitted = jax.lax.while_loop(
                cond, body, init
            )
            return grid, t_vec, done_acc, emitted

        # Donation is safe: extraction numpy views are copied before the
        # next dispatch, and slot_t updates are copy-on-write (see step()).
        self._step = jax.jit(step_chunk, donate_argnums=(0,))

        def insert_many(grid, slots, keys_a, enc_out_a, enc_mask_a, st_a):
            """Scatter an admission batch into its slots in one program.

            ``slots`` [A] int32 — padding entries carry the sentinel
            ``max_slots`` so every write they would make is out of bounds
            and ``mode='drop'`` discards it. Per-beam expansion (repeat k)
            happens in here so admission is exactly one dispatch.
            """
            enc_keys, enc_out, enc_mask, beam = grid
            a = slots.shape[0]
            rows = (slots[:, None] * k + jnp.arange(k)[None, :]).reshape(-1)

            def rep(x):
                return jnp.repeat(x, k, axis=0)

            # enc tensors are per-slot (no beam expansion — see _empty_grid)
            enc_keys = enc_keys.at[slots].set(keys_a, mode="drop")
            enc_out = enc_out.at[slots].set(enc_out_a, mode="drop")
            enc_mask = enc_mask.at[slots].set(enc_mask_a, mode="drop")
            new_dec = jax.tree.map(
                lambda full, new: full.at[rows].set(rep(new), mode="drop"),
                beam.decoder_state,
                st_a,
            )
            init_scores = jnp.tile(
                jnp.array([0.0] + [NEG_INF] * (k - 1), jnp.float32), (a, 1)
            )
            # ring histories need NO reset on admission: a slot's valid
            # window starts at its admission ring position, so stale epochs
            # in other columns are unreachable by extraction
            beam = BeamState(
                decoder_state=new_dec,
                sym=beam.sym,
                parent=beam.parent,
                last_token=beam.last_token.at[slots].set(
                    jnp.full((a, k), BOS, jnp.int32), mode="drop"
                ),
                scores=beam.scores.at[slots].set(init_scores, mode="drop"),
                finished=beam.finished.at[slots].set(
                    jnp.zeros((a, k), bool), mode="drop"
                ),
                lengths=beam.lengths.at[slots].set(
                    jnp.zeros((a, k), jnp.int32), mode="drop"
                ),
                coverage=(
                    None
                    if beam.coverage is None
                    else beam.coverage.at[slots].set(
                        jnp.zeros((a, k, t_src), jnp.float32), mode="drop"
                    )
                ),
            )
            return (enc_keys, enc_out, enc_mask, beam)

        self._insert_many = jax.jit(insert_many, donate_argnums=(0,))

        def extract(grid, slots, g0s, t_lens):
            """Reconstruct + rank hypotheses for up to ``admit_batch`` DONE
            slots in one dispatch, device-side (the reference's
            ``Beam.get_hyp``, batched): unroll each slot's ring window to
            step order, backtrace, rank — only [E, n_best, T_max] tokens
            ever reach the host (the pre-round-4 design pulled the entire
            [S, K, T_max] token grid on any completion). ``slots`` entries
            equal to ``max_slots`` are padding (clamped; caller ignores
            their rows)."""
            beam = grid[3]
            sl = jnp.clip(slots, 0, s - 1)
            # gather only the requested slots' beam-row columns ([E*K] of
            # the flat [T, S*K] ring) — never reshape the full buffer
            cols = (sl[:, None] * k + jnp.arange(k)[None, :]).reshape(-1)
            sym_a, par_a = unroll_ring(
                beam.sym[:, cols], beam.parent[:, cols], g0s, t_lens,
                beam_size=k, pad_id=PAD,
            )
            toks = reconstruct_tokens(sym_a, par_a, k)[:, :, :t_max]
            lp = length_penalty(beam.lengths[sl], cfg.beam.length_penalty)
            norm = beam.scores[sl] / lp
            if beam.coverage is not None:
                norm = norm + coverage_penalty(
                    beam.coverage[sl], cfg.beam.coverage_penalty
                )
            top_scores, order = jax.lax.top_k(norm, cfg.beam.n_best)
            toks_n = jnp.take_along_axis(toks, order[:, :, None], axis=1)
            return toks_n, top_scores

        self._extract = jax.jit(extract)
        self._grid = self._empty_grid()
        if mesh is not None:
            # rows (slots x beams) over `data`; beam bookkeeping replicated
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import DATA_AXIS

            def put(x):
                if x.shape and x.shape[0] in (s * k, s):
                    spec = P(DATA_AXIS)
                elif x.ndim == 2 and x.shape[1] == s * k:  # [T, S*K] rings
                    spec = P(None, DATA_AXIS)
                else:
                    spec = P()
                return jax.device_put(x, NamedSharding(mesh, spec))

            enc_keys, enc_out, enc_mask, beam = self._grid
            self._grid = (
                put(enc_keys),
                put(enc_out),
                put(enc_mask),
                beam.__class__(
                    decoder_state=jax.tree.map(put, beam.decoder_state),
                    sym=put(beam.sym),
                    parent=put(beam.parent),
                    last_token=put(beam.last_token),
                    scores=put(beam.scores),
                    finished=put(beam.finished),
                    lengths=put(beam.lengths),
                    coverage=(
                        None if beam.coverage is None else put(beam.coverage)
                    ),
                ),
            )

    def _empty_grid(self):
        cfg = self.cfg
        s, k = cfg.max_slots, cfg.beam.beam_size
        t_src, t_max = cfg.max_src_len, cfg.max_tgt_len
        # probe encode to learn state/hidden shapes — at the SAME batch width
        # the admission path uses, so only one encode program ever compiles
        a = cfg.admit_batch
        probe_src = jnp.full((a, t_src), PAD, jnp.int32).at[:, 0].set(BOS)
        keys, enc_out, enc_mask, st = self._encode(probe_src, jnp.ones((a,), jnp.int32))
        h = enc_out.shape[-1]
        dtype = enc_out.dtype
        zeros_state = jax.tree.map(
            lambda x: jnp.zeros((s * k,) + x.shape[1:], x.dtype), st
        )
        beam = BeamState(
            decoder_state=zeros_state,
            # ring depth = max_tgt_len + chunk headroom (see __init__);
            # time-major FLAT [T, S*K] so the per-step write is one
            # contiguous lane-aligned row
            sym=jnp.full((self._t_hist, s * k), PAD, jnp.int32),
            parent=jnp.tile(
                jnp.arange(k, dtype=PARENT_DTYPE), (self._t_hist, s)
            ),
            last_token=jnp.full((s, k), BOS, jnp.int32),
            scores=jnp.full((s, k), NEG_INF, jnp.float32),
            finished=jnp.ones((s, k), bool),
            lengths=jnp.zeros((s, k), jnp.int32),
            coverage=(
                jnp.zeros((s, k, t_src), jnp.float32) if self._cov else None
            ),
        )
        # encoder tensors are per-SLOT (beams fold inside the decode body):
        # k-times less grid memory and per-step attention HBM traffic
        return (
            jnp.zeros((s, t_src, keys.shape[-1]), keys.dtype),
            jnp.zeros((s, t_src, h), dtype),
            jnp.zeros((s, t_src), bool),
            beam,
        )

    # ---- public API ----
    def submit(self, src_tokens) -> int:
        """Queue a tokenized source sentence; returns the request id."""
        rid = self._next_id
        self._next_id += 1
        arr = np.full(self.cfg.max_src_len, PAD, np.int32)
        n = min(len(src_tokens), self.cfg.max_src_len)
        arr[:n] = np.asarray(src_tokens[:n], np.int32)
        self._queue.append((rid, arr, n))
        return rid

    @property
    def pending(self) -> int:
        return len(self._queue) + sum(
            len(b["pending"]) for b in self._staged
        )

    @property
    def active_slots(self) -> int:
        return sum(r is not None for r in self._slot_req)

    def _stage(self):
        """Pre-encode queued sentences into device-resident admission
        batches (up to ``cfg.stage_ahead`` of them), regardless of slot
        availability — the encode dispatch overlaps the running decode
        chunk, and a later :meth:`_admit` becomes a single scatter."""
        cfg = self.cfg
        a = cfg.admit_batch
        while self._queue and len(self._staged) < cfg.stage_ahead:
            take = min(len(self._queue), a)
            src = np.full((a, cfg.max_src_len), PAD, np.int32)
            src[:, 0] = BOS  # harmless filler rows; never admitted
            lens = np.ones(a, np.int32)
            pending = []
            for j in range(take):
                rid, arr, n = self._queue.pop(0)
                src[j], lens[j] = arr, n
                pending.append((j, rid))
            tensors = self._encode(jnp.asarray(src), jnp.asarray(lens))
            self._staged.append({"tensors": tensors, "pending": pending})

    def _book_admissions(self, admitted):
        t = self._slot_t.copy()  # copy-on-write, see step()
        g0 = self._slot_g0.copy()
        for slot, rid in admitted:
            self._slot_req[slot] = rid
            t[slot] = 0
            # the slot's ring window starts at the next inner step
            g0[slot] = self.steps_run % self._t_hist
        self._slot_t = t
        self._slot_g0 = g0

    def _admit(self):
        cfg = self.cfg
        a = cfg.admit_batch
        free = [i for i, r in enumerate(self._slot_req) if r is None]
        # staged (pre-encoded) batches first — FIFO is preserved because
        # _stage pops from the queue front and batches admit in order; a
        # partially-admitted batch keeps its remaining rows staged (rows not
        # taken carry the sentinel and their scatters drop)
        while self._staged and free:
            batch = self._staged[0]
            pending = batch["pending"]
            take = min(len(pending), len(free))
            slots = np.full(a, cfg.max_slots, np.int32)
            admitted = []
            for _ in range(take):
                row, rid = pending.pop(0)
                slot = free.pop(0)
                slots[row] = slot
                admitted.append((slot, rid))
            keys, enc_out, enc_mask, st = batch["tensors"]
            self._grid = self._insert_many(
                self._grid, jnp.asarray(slots), keys, enc_out, enc_mask, st
            )
            self._book_admissions(admitted)
            if not pending:
                self._staged.pop(0)
        while self._queue and free:
            take = min(len(self._queue), len(free), a)
            src = np.full((a, cfg.max_src_len), PAD, np.int32)
            src[:, 0] = BOS  # harmless filler rows; their writes are dropped
            lens = np.ones(a, np.int32)
            # padding entries scatter out of bounds (mode='drop'): sentinel
            slots = np.full(a, cfg.max_slots, np.int32)
            admitted = []
            for j in range(take):
                rid, arr, n = self._queue.pop(0)
                slot = free.pop(0)
                src[j], lens[j], slots[j] = arr, n, slot
                admitted.append((slot, rid))
            keys, enc_out, enc_mask, st = self._encode(
                jnp.asarray(src), jnp.asarray(lens)
            )
            self._grid = self._insert_many(
                self._grid, jnp.asarray(slots), keys, enc_out, enc_mask, st
            )
            self._book_admissions(admitted)

    def step(self, chunk_steps: Optional[int] = None) -> List[Completion]:
        """Admit pending work, run one decode chunk, pop completed slots.

        One chunk = ``chunk_steps`` device-side decode steps (host readback
        once at the end); counters track inner steps. Default policy:
        ``cfg.chunk_steps``, dropped to ``cfg.chunk_steps_busy`` while the
        queue is non-empty (the chunk length is a runtime argument of the
        compiled program, so adapting it is free) — a completion strands its
        slot only until the chunk ends, so shorter chunks under queue
        pressure convert stranded slot-steps into admitted work.
        """
        if self._poisoned:
            raise RuntimeError(
                "engine state was force-advanced by drive_chunks("
                "force_active=True) — benchmark semantics stepped empty "
                "slots from garbage; build a fresh TranslationEngine to serve"
            )
        self._admit()
        self._stage()  # pre-encode next arrivals; overlaps the chunk below
        active = np.array([r is not None for r in self._slot_req])
        if not active.any():
            return []
        if chunk_steps is None:
            busy = self.cfg.chunk_steps_busy or self.cfg.chunk_steps
            chunk_steps = busy if self._queue else self.cfg.chunk_steps
        if chunk_steps > self._chunk_cap:
            raise ValueError(
                f"chunk_steps {chunk_steps} exceeds the ring-history "
                f"headroom {self._chunk_cap} (a finished slot's window "
                "would be overwritten before extraction)"
            )
        # CRITICAL: never mutate self._slot_t in place. The host->device
        # transfer of a dispatched step's arguments can be deferred under
        # async load, so an in-place mutation here is observed by the
        # IN-FLIGHT computation (seen as slots skipping/duplicating token
        # positions, ~30%% of staggered runs). All updates below rebind
        # self._slot_t to a fresh array (copy-on-write).
        self._grid, t_new, done, emitted = self._step(
            self._grid, jnp.asarray(self._slot_t), jnp.array(active),
            jnp.int32(chunk_steps), jnp.int32(self.steps_run % self._t_hist),
        )
        self.steps_run += chunk_steps
        self.tokens_emitted += int(emitted)
        self._slot_t = np.array(t_new)  # fresh writable host copy
        done_np = np.asarray(done)
        out: List[Completion] = []
        if done_np.any():
            # device-side backtrace + ranking for done slots only, extracted
            # in fixed-width batches (sentinel-padded) — one small program,
            # [E, n_best, T_max] ints to host instead of the whole grid
            n_best = self.cfg.beam.n_best
            e = self.cfg.admit_batch
            done_slots = np.where(done_np)[0]
            for i in range(0, len(done_slots), e):
                chunk = done_slots[i : i + e]
                slots_arg = np.full(e, self.cfg.max_slots, np.int32)
                slots_arg[: len(chunk)] = chunk
                toks_n, scores_n = self._extract(
                    self._grid,
                    jnp.asarray(slots_arg),
                    jnp.asarray(self._slot_g0[np.clip(slots_arg, 0, self.cfg.max_slots - 1)]),
                    jnp.asarray(self._slot_t[np.clip(slots_arg, 0, self.cfg.max_slots - 1)]),
                )
                toks_np = np.asarray(toks_n)
                scores_np = np.asarray(scores_n)
                for j, slot in enumerate(chunk):
                    comp = Completion(
                        request_id=self._slot_req[slot],
                        tokens=toks_np[j, 0].copy(),
                        score=float(scores_np[j, 0]),
                    )
                    if n_best > 1:
                        comp.nbest_tokens = toks_np[j].copy()
                        comp.nbest_scores = scores_np[j].copy()
                    out.append(comp)
                    self._slot_req[slot] = None
                    t = self._slot_t.copy()
                    t[slot] = 0
                    self._slot_t = t
        self._results.extend(out)
        return out

    def drive_chunks(
        self,
        n_chunks: int,
        force_active: bool = True,
        chunk_steps: Optional[int] = None,
    ) -> int:
        """Advance the whole grid ``n_chunks`` compiled chunk dispatches with
        NO host readback between them — device-resident pipelining, exactly
        how a production host drives the engine — then sync on the last
        chunk's emitted-token scalar and return it.

        This is the public timing entry point (bench.py --engine): per-
        dispatch relay overhead amortizes across the pipelined dispatches
        and cancels in a two-point estimate over ``n_chunks``.

        ``force_active=True`` treats every slot as live regardless of
        completion bookkeeping (benchmark semantics: a full grid decoding
        forever). Completions are NOT extracted, and the forced advance
        steps empty slots from garbage state, so the engine is POISONED for
        serving afterwards — a later :meth:`step` raises. With
        ``force_active=False`` only live slots advance and slot timers are
        written back, so :meth:`step` remains usable (its next chunk picks
        up completions normally).
        """
        active = (
            jnp.ones((self.cfg.max_slots,), bool)
            if force_active
            else jnp.asarray([r is not None for r in self._slot_req])
        )
        n = chunk_steps or self.cfg.chunk_steps
        if n > self._chunk_cap:
            raise ValueError(
                f"chunk_steps {n} exceeds the ring-history headroom "
                f"{self._chunk_cap}"
            )
        if not force_active and n_chunks * n > self._chunk_cap:
            # Without extraction between chunks, a slot that finishes in the
            # FIRST chunk sits unextracted for the whole drive; its ring
            # window would be overwritten once total steps exceed the
            # headroom and the later step() extraction would silently return
            # corrupted hypotheses. (force_active=True poisons the engine
            # anyway, so only the serving-preserving path needs the bound.)
            raise ValueError(
                f"drive_chunks(force_active=False): n_chunks*chunk_steps "
                f"{n_chunks * n} exceeds the ring-history headroom "
                f"{self._chunk_cap}; interleave step() to extract, or drive "
                "fewer chunks"
            )
        grid, t_vec = self._grid, jnp.asarray(self._slot_t)
        n_inner = jnp.int32(n)
        em = jnp.int32(0)
        g = self.steps_run
        for _ in range(n_chunks):
            # grid is donated per dispatch; rebind so the engine stays valid
            grid, t_vec, _, em = self._step(
                grid, t_vec, active, n_inner, jnp.int32(g % self._t_hist)
            )
            g += n
        self._grid = grid
        self.steps_run = g  # ring position stays consistent for step()
        if force_active:
            self._poisoned = True
        else:
            self._slot_t = np.array(t_vec)  # fresh writable host copy
        return int(em)

    def run_until_drained(self, max_steps: int = 100000) -> List[Completion]:
        """Drive until queue and slots are empty; returns all completions."""
        out: List[Completion] = []
        steps = 0
        while (self.pending or self.active_slots) and steps < max_steps:
            out.extend(self.step())
            steps += 1
        return out
