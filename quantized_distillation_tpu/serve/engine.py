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
  [S, K, T_max] tokens). These are what the sharding rules tensor-shard.
- Each slot sits at its own decode depth: ``step_beams`` takes a per-slot
  ``t`` vector; inactive slots are masked back to their previous state.
- Admission = one jitted ``insert`` (dynamic_update_slice at a traced slot
  index — one program regardless of slot) after a one-sentence jitted encode.
- The host loop only does queue/slot bookkeeping and reads back a tiny
  [S] done-flag array per step; all math stays on device.

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
    BeamState,
    expand_to_beams,
    length_penalty,
    step_beams,
    step_beams_cand,
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
        if mesh is not None:
            from ..parallel.mesh import DATA_AXIS

            dp = mesh.shape[DATA_AXIS]
            if cfg.max_slots % dp:
                raise ValueError(
                    f"max_slots {cfg.max_slots} must divide data axis {dp}"
                )
        self._next_id = 0
        self._queue: List[Tuple[int, np.ndarray, int]] = []
        self._slot_req: List[Optional[int]] = [None] * cfg.max_slots
        self._slot_t = np.zeros(cfg.max_slots, np.int32)
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

            _sh_step = make_sharded_decode_step_topk(dec, mesh, k)

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
                        dec, st, tokens, enc_keys, enc_out, enc_mask, k
                    )

            else:

                def decode_step(enc_keys, enc_out, enc_mask, st, tokens):
                    return packed_decode_step(
                        dec, st, tokens, enc_keys, enc_out, enc_mask
                    )

        else:

            def encode(src, src_len):
                enc_out, enc_mask, st = model.apply(
                    variables, src, src_len, method=model.encode
                )
                return enc_out, enc_out, enc_mask, st

            def decode_step(enc_keys, enc_out, enc_mask, st, tokens):
                return model.apply(
                    variables, st, tokens, enc_out, enc_mask,
                    method=model.decode_step,
                )

        self._encode = jax.jit(encode)

        def step(grid, t_vec, active):
            enc_keys, enc_out, enc_mask, beam = grid

            def ds(st, tokens):
                return decode_step(enc_keys, enc_out, enc_mask, st, tokens)

            stepper = step_beams_cand if use_cand else step_beams
            new_beam = stepper(
                ds, beam, t_vec, beam_size=k, eos_id=EOS, pad_id=PAD
            )
            # inactive slots keep their previous state untouched
            row = active[:, None]
            rowk = jnp.repeat(active, k)

            def keep(new, old):
                mask = rowk if new.shape[0] == s * k else active
                extra = (1,) * (new.ndim - 1)
                return jnp.where(mask.reshape((-1,) + extra), new, old)

            merged = BeamState(
                decoder_state=jax.tree.map(keep, new_beam.decoder_state, beam.decoder_state),
                tokens=jnp.where(row[..., None], new_beam.tokens, beam.tokens),
                last_token=jnp.where(row, new_beam.last_token, beam.last_token),
                scores=jnp.where(row, new_beam.scores, beam.scores),
                finished=jnp.where(row, new_beam.finished, beam.finished),
                lengths=jnp.where(row, new_beam.lengths, beam.lengths),
            )
            done = active & (
                jnp.all(merged.finished, axis=1) | (t_vec + 1 >= t_max)
            )
            return (enc_keys, enc_out, enc_mask, merged), done

        # Donation is safe: extraction numpy views are copied before the
        # next dispatch, and slot_t updates are copy-on-write (see step()).
        self._step = jax.jit(step, donate_argnums=(0,))

        def insert(grid, slot, enc_keys_k, enc_out_k, enc_mask_k, dec_state_k):
            enc_keys, enc_out, enc_mask, beam = grid
            r0 = slot * k
            enc_keys = jax.lax.dynamic_update_slice(
                enc_keys, enc_keys_k, (r0, 0, 0)
            )
            enc_out = jax.lax.dynamic_update_slice(enc_out, enc_out_k, (r0, 0, 0))
            enc_mask = jax.lax.dynamic_update_slice(enc_mask, enc_mask_k, (r0, 0))
            new_dec = jax.tree.map(
                lambda full, new: jax.lax.dynamic_update_slice(
                    full, new, (r0,) + (0,) * (full.ndim - 1)
                ),
                beam.decoder_state,
                dec_state_k,
            )
            init_scores = jnp.array([0.0] + [NEG_INF] * (k - 1), jnp.float32)
            beam = BeamState(
                decoder_state=new_dec,
                tokens=jax.lax.dynamic_update_slice(
                    beam.tokens, jnp.full((1, k, t_max), PAD, jnp.int32), (slot, 0, 0)
                ),
                last_token=jax.lax.dynamic_update_slice(
                    beam.last_token, jnp.full((1, k), BOS, jnp.int32), (slot, 0)
                ),
                scores=jax.lax.dynamic_update_slice(
                    beam.scores, init_scores[None], (slot, 0)
                ),
                finished=jax.lax.dynamic_update_slice(
                    beam.finished, jnp.zeros((1, k), bool), (slot, 0)
                ),
                lengths=jax.lax.dynamic_update_slice(
                    beam.lengths, jnp.zeros((1, k), jnp.int32), (slot, 0)
                ),
            )
            return (enc_keys, enc_out, enc_mask, beam)

        self._insert = jax.jit(insert, donate_argnums=(0,))
        self._grid = self._empty_grid()
        if mesh is not None:
            # rows (slots x beams) over `data`; beam bookkeeping replicated
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import DATA_AXIS

            def put(x):
                spec = P(DATA_AXIS) if x.shape and x.shape[0] in (s * k, s) else P()
                return jax.device_put(x, NamedSharding(mesh, spec))

            enc_keys, enc_out, enc_mask, beam = self._grid
            self._grid = (
                put(enc_keys),
                put(enc_out),
                put(enc_mask),
                beam.__class__(
                    decoder_state=jax.tree.map(put, beam.decoder_state),
                    tokens=put(beam.tokens),
                    last_token=put(beam.last_token),
                    scores=put(beam.scores),
                    finished=put(beam.finished),
                    lengths=put(beam.lengths),
                ),
            )

    def _empty_grid(self):
        cfg = self.cfg
        s, k = cfg.max_slots, cfg.beam.beam_size
        t_src, t_max = cfg.max_src_len, cfg.max_tgt_len
        # probe encode to learn state/hidden shapes
        probe_src = jnp.full((1, t_src), PAD, jnp.int32).at[0, 0].set(BOS)
        keys, enc_out, enc_mask, st = self._encode(probe_src, jnp.ones((1,), jnp.int32))
        h = enc_out.shape[-1]
        dtype = enc_out.dtype
        zeros_state = jax.tree.map(
            lambda x: jnp.zeros((s * k,) + x.shape[1:], x.dtype), st
        )
        beam = BeamState(
            decoder_state=zeros_state,
            tokens=jnp.full((s, k, t_max), PAD, jnp.int32),
            last_token=jnp.full((s, k), BOS, jnp.int32),
            scores=jnp.full((s, k), NEG_INF, jnp.float32),
            finished=jnp.ones((s, k), bool),
            lengths=jnp.zeros((s, k), jnp.int32),
        )
        return (
            jnp.zeros((s * k, t_src, keys.shape[-1]), keys.dtype),
            jnp.zeros((s * k, t_src, h), dtype),
            jnp.zeros((s * k, t_src), bool),
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
        return len(self._queue)

    @property
    def active_slots(self) -> int:
        return sum(r is not None for r in self._slot_req)

    def _admit(self):
        k = self.cfg.beam.beam_size
        for slot in range(self.cfg.max_slots):
            if not self._queue:
                break
            if self._slot_req[slot] is not None:
                continue
            rid, arr, n = self._queue.pop(0)
            keys, enc_out, enc_mask, st = self._encode(
                jnp.asarray(arr)[None], jnp.asarray([n], jnp.int32)
            )
            self._grid = self._insert(
                self._grid,
                slot,
                jnp.repeat(keys, k, axis=0),
                jnp.repeat(enc_out, k, axis=0),
                jnp.repeat(enc_mask, k, axis=0),
                expand_to_beams(st, k),
            )
            self._slot_req[slot] = rid
            t = self._slot_t.copy()  # copy-on-write, see step()
            t[slot] = 0
            self._slot_t = t

    def step(self) -> List[Completion]:
        """Admit pending work, run one decode step, pop completed slots."""
        self._admit()
        active = np.array([r is not None for r in self._slot_req])
        if not active.any():
            return []
        # CRITICAL: never mutate self._slot_t in place. The host->device
        # transfer of a dispatched step's arguments can be deferred under
        # async load, so an in-place mutation here is observed by the
        # IN-FLIGHT computation (seen as slots skipping/duplicating token
        # positions, ~30%% of staggered runs). All updates below rebind
        # self._slot_t to a fresh array (copy-on-write).
        self._grid, done = self._step(
            self._grid, jnp.asarray(self._slot_t), jnp.array(active)
        )
        self.steps_run += 1
        self.tokens_emitted += int(active.sum())
        self._slot_t = self._slot_t + active.astype(np.int32)
        done_np = np.asarray(done)
        out: List[Completion] = []
        if done_np.any():
            beam: BeamState = self._grid[3]
            lp = length_penalty(beam.lengths, self.cfg.beam.length_penalty)
            norm = np.asarray(beam.scores / lp)
            toks = np.asarray(beam.tokens)
            n_best = self.cfg.beam.n_best
            for slot in np.where(done_np)[0]:
                order = np.argsort(-norm[slot])
                best = int(order[0])
                comp = Completion(
                    request_id=self._slot_req[slot],
                    tokens=toks[slot, best].copy(),
                    score=float(norm[slot, best]),
                )
                if n_best > 1:
                    top = order[:n_best]
                    comp.nbest_tokens = toks[slot, top].copy()
                    comp.nbest_scores = norm[slot, top].copy()
                out.append(comp)
                self._slot_req[slot] = None
                t = self._slot_t.copy()
                t[slot] = 0
                self._slot_t = t
        self._results.extend(out)
        return out

    def run_until_drained(self, max_steps: int = 100000) -> List[Completion]:
        """Drive until queue and slots are empty; returns all completions."""
        out: List[Completion] = []
        steps = 0
        while (self.pending or self.active_slots) and steps < max_steps:
            out.extend(self.step())
            steps += 1
        return out
