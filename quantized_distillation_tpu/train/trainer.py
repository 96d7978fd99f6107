"""Jit'd knowledge-distillation trainer with fake-quant STE weights.

Re-designs the reference's training orchestration
(``cnn_models/help_fun.py::train_model`` and the NMT loop in
``translation_models/help_fun.py``). One compiled ``train_step`` contains the
whole per-batch pipeline the reference runs as Python: fake-quantize the
weights (STE), student forward, teacher forward (stop-grad), KD loss,
backward, optimizer update on the full-precision master weights.

TPU-first:

- The step is a single ``jax.jit`` with donated state: weights, optimizer
  state and batch stats live on device; the host only feeds batches.
- Data parallelism is sharding, not code: given a mesh, the batch is sharded
  over the ``data`` axis and the state replicated; XLA inserts the gradient
  ``psum``. No process groups, no NCCL (the reference has none either — this
  is pure capability addition per BASELINE north-star).
- Three quantization modes cover both paper algorithms:
  ``weights`` (quantized distillation: STE fake-quant, optimizer on FP
  master weights), ``codebooks`` (differentiable quantization: weights
  frozen, optimizer on the per-layer quantization points), ``joint``.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import DistillSpec, QuantSpec, TrainConfig
from . import quantize_tree as qt
from .losses import distillation_loss

PyTree = Any
Batch = Dict[str, jnp.ndarray]


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: PyTree
    opt_state: optax.OptState
    batch_stats: Optional[PyTree] = None
    codebooks: Optional[Dict[str, jnp.ndarray]] = None
    # Recurrent state threaded across steps (truncated BPTT, data/lm.py
    # contiguous lanes). When set, the train step injects it into the batch
    # as batch["carry"] (stop-gradient) and stores the task's
    # updates["carry"] back — the standard PTB carry-threading recipe with
    # the step still a single jit.
    carry: Optional[PyTree] = None


@dataclass(frozen=True)
class Task:
    """What the trainer needs to know about a workload.

    ``student_forward(variables, batch, train, rngs) -> (logits, updates)``
    where ``updates`` is the mutated collections dict (batch_stats) or {}.
    ``teacher_forward(batch) -> logits`` is pre-bound to teacher variables.
    ``loss_and_metrics(student_logits, teacher_logits, batch, distill)``
    returns ``(scalar loss, metrics dict)``.
    """

    student_forward: Callable[..., Tuple[jnp.ndarray, Dict]]
    loss_and_metrics: Callable[..., Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]]
    teacher_forward: Optional[Callable[[Batch], jnp.ndarray]] = None


def build_optimizer(cfg: TrainConfig, steps_per_epoch: int = 1) -> optax.GradientTransformation:
    """Optimizer + LR schedule (reference: torch.optim + onmt/Optim.py)."""
    total_steps = max(cfg.epochs * steps_per_epoch, 1)
    if cfg.lr_schedule == "cosine":
        sched = optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, max(cfg.warmup_steps, 1), total_steps
        )
    elif cfg.lr_schedule == "step":
        every = cfg.lr_decay_every or steps_per_epoch
        sched = optax.exponential_decay(
            cfg.learning_rate, every, cfg.lr_decay_rate, staircase=True
        )
    else:
        sched = optax.constant_schedule(cfg.learning_rate)
    if cfg.optimizer == "adam":
        tx = optax.adam(sched)
    elif cfg.optimizer == "sgd":
        tx = optax.sgd(sched)
    elif cfg.optimizer == "momentum":
        tx = optax.sgd(sched, momentum=0.9, nesterov=True)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    chain = []
    if cfg.clip_norm:
        chain.append(optax.clip_by_global_norm(cfg.clip_norm))
    if cfg.weight_decay:
        chain.append(optax.add_decayed_weights(cfg.weight_decay))
    chain.append(tx)
    return optax.chain(*chain)


def _trainable(state: TrainState, mode: str) -> PyTree:
    if mode == "weights":
        return state.params
    if mode == "codebooks":
        return state.codebooks
    if mode == "joint":
        return (state.params, state.codebooks)
    raise ValueError(f"unknown train mode {mode!r}")


def _with_trainable(state: TrainState, mode: str, value: PyTree) -> TrainState:
    if mode == "weights":
        return state.replace(params=value)
    if mode == "codebooks":
        return state.replace(codebooks=value)
    return state.replace(params=value[0], codebooks=value[1])


def create_train_state(
    params: PyTree,
    tx: optax.GradientTransformation,
    *,
    batch_stats: Optional[PyTree] = None,
    quant: Optional[QuantSpec] = None,
    codebook_init: str = "uniform",
    mode: str = "weights",
    carry: Optional[PyTree] = None,
) -> TrainState:
    codebooks = None
    if quant is not None and quant.method == "codebook":
        codebooks = qt.init_codebook_tree(params, quant, codebook_init)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(
            _trainable(
                TrainState(jnp.zeros((), jnp.int32), params, None, batch_stats, codebooks),
                mode,
            )
        ),
        batch_stats=batch_stats,
        codebooks=codebooks,
        # private copy: the donated train step consumes state buffers, and
        # the caller's carry pytree must survive (e.g. for later evals)
        carry=None if carry is None else jax.tree.map(jnp.array, carry),
    )
    return state


def quantized_params(
    params: PyTree,
    quant: Optional[QuantSpec],
    codebooks: Optional[Dict[str, jnp.ndarray]],
    key: Optional[jax.Array],
    bits_map: Optional[Dict[str, int]] = None,
) -> PyTree:
    """STE fake-quant view of the parameters (identity when quant is None)."""
    if quant is None:
        return params
    if quant.method == "codebook":
        return qt.ste_codebook_tree(params, codebooks, quant)
    return qt.ste_quantize_tree(params, quant, key, bits_map)


def make_train_step(
    task: Task,
    tx: optax.GradientTransformation,
    *,
    quant: Optional[QuantSpec] = None,
    distill: Optional[DistillSpec] = None,
    mode: str = "weights",
    donate: bool = True,
    bits_map: Optional[Dict[str, int]] = None,
    mesh=None,
    grad_reduce_dtype=None,
):
    """Build the compiled train step: (state, batch, rng) -> (state, metrics).

    ``bits_map`` (from :mod:`.bits`) gives per-layer bit-widths for
    mixed-precision quantized training.

    ``grad_reduce_dtype`` (requires ``mesh``): perform the data-parallel
    gradient all-reduce in a narrower dtype (bf16 halves the DCN wire bytes
    per step — the implemented lever behind the >=85% 1→2-host scaling gate,
    BASELINE.md). Mechanism: the gradient computation runs under a
    ``shard_map`` manual over the ``data`` axis (any ``model`` axis stays
    auto, so tensor-parallel shardings are preserved); each shard pre-scales
    its local grads by its cross-shard weight, casts to
    ``grad_reduce_dtype``, and ``psum``s — the collective the partitioner
    emits carries bf16 — then casts back so optax still sees f32. Weight
    fake-quant uses the same rng on every shard (shards must see identical
    quantized weights); dropout rng is folded per shard. When the task's
    metrics report ``n_tokens`` (masked seq losses), shards are weighted by
    their token counts — ``psum(loss * n_local) / psum(n_local)`` — so the
    flag reproduces the baseline path's GLOBAL token mean and changes only
    the collective dtype; tasks without ``n_tokens`` (vision: every shard
    holds the same number of rows) use the equivalent equal-shard 1/D.
    """
    from ..parallel.mesh import DATA_AXIS

    if grad_reduce_dtype is not None and mesh is None:
        raise ValueError("grad_reduce_dtype requires a mesh")

    def loss_fn(trainable, state, batch, q_rng, dropout_rng):
        # all traced inputs are explicit arguments (not closures) so the
        # same function works under shard_map for the bf16-reduce path
        tmp = _with_trainable(state, mode, trainable)
        params = tmp.params if mode != "codebooks" else jax.lax.stop_gradient(
            tmp.params
        )
        q_params = quantized_params(params, quant, tmp.codebooks, q_rng, bits_map)
        variables = {"params": q_params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        logits, updates = task.student_forward(
            variables, batch, True, {"dropout": dropout_rng}
        )
        teacher_logits = (
            task.teacher_forward(batch) if task.teacher_forward else None
        )
        loss, metrics = task.loss_and_metrics(
            logits, teacher_logits, batch, distill
        )
        return loss, (metrics, updates)

    def step_fn(state: TrainState, batch: Batch, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        q_rng, dropout_rng = jax.random.split(rng)
        if state.carry is not None:
            batch = dict(batch, carry=jax.lax.stop_gradient(state.carry))

        if grad_reduce_dtype is not None:
            loss, metrics, updates, grads = _reduced_precision_grads(
                loss_fn, _trainable(state, mode),
                state.replace(carry=None), batch, q_rng, dropout_rng,
                mesh, DATA_AXIS, grad_reduce_dtype,
            )
        else:
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (loss, (metrics, updates)), grads = grad_fn(
                _trainable(state, mode), state, batch, q_rng, dropout_rng
            )
        opt_updates, new_opt_state = tx.update(
            grads, state.opt_state, _trainable(state, mode)
        )
        new_trainable = optax.apply_updates(_trainable(state, mode), opt_updates)
        state = _with_trainable(state, mode, new_trainable)
        state = state.replace(
            step=state.step + 1,
            opt_state=new_opt_state,
            batch_stats=updates.get("batch_stats", state.batch_stats),
            carry=updates.get("carry", state.carry),
        )
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def preferred_grad_reduce_dtype():
    """bf16 on TPU (full f32 exponent range, native all-reduce support);
    f16 on CPU. The CPU fallback exists because this jaxlib's CPU backend
    crashes compiling any bf16 all-reduce (XLA ``AllReducePromotion`` check
    failure, "Invalid binary instruction opcode copy") — f16 compiles, runs,
    and carries the identical 2 bytes/element on the wire, so CPU tests and
    the comm-budget scripts measure the true byte halving.
    """
    return jnp.float16 if jax.default_backend() == "cpu" else jnp.bfloat16


def _reduced_precision_grads(
    loss_fn, trainable, state, batch, q_rng, dropout_rng, mesh, data_axis, rdtype
):
    """Gradients with the data-axis all-reduce carried in ``rdtype``.

    Manual ``shard_map`` over the data axis only — any other mesh axis
    (tensor-parallel ``model``) stays auto, so XLA keeps partitioning the
    per-shard forward/backward. Grads are pre-scaled by their cross-shard
    weight (token-count weighted when the task reports ``n_tokens``, else
    1/D — both reproduce the baseline path's global mean), cast to
    ``rdtype`` (this is what the wire carries), ``psum``'d, then cast back
    to f32 for optax. bf16 shares f32's exponent range, so the cast cannot
    overflow; the D-way bf16 accumulation noise is far below SGD gradient
    noise (accuracy-neutrality is tested in tests/test_trainer.py and
    demonstrated on the toy tasks in BASELINE.md).
    """
    from jax.sharding import PartitionSpec as P

    ndev = mesh.shape[data_axis]

    def body(trainable, state, batch, q_rng, dropout_rng):
        # dropout differs per shard; weight fake-quant rng must NOT be
        # folded (every shard has to see identical quantized weights)
        dropout_rng = jax.random.fold_in(
            dropout_rng, jax.lax.axis_index(data_axis)
        )
        (loss, (metrics, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(trainable, state, batch, q_rng, dropout_rng)
        if isinstance(metrics, dict) and "n_tokens" in metrics:
            # masked seq loss: the local loss is a mean over the shard's
            # live tokens, so the global token mean weights each shard by
            # its token count (== the baseline path's global masked mean)
            n_local = metrics["n_tokens"].astype(jnp.float32)
            w = n_local / jax.lax.psum(n_local, data_axis)
        else:
            w = 1.0 / ndev
        grads = jax.lax.psum(
            jax.tree.map(lambda g: (g * w).astype(rdtype), grads), data_axis
        )
        grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
        loss = jax.lax.psum(loss * w, data_axis)
        metrics = jax.lax.pmean(metrics, data_axis)
        updates = dict(updates)
        carry = updates.pop("carry", None)  # batch-aligned: stays sharded
        if updates:
            updates = jax.lax.pmean(updates, data_axis)
        return loss, metrics, updates, carry, grads

    kw = dict(
        mesh=mesh,
        in_specs=(P(), P(), P(data_axis), P(), P()),
        out_specs=(P(), P(), P(), P(data_axis), P()),
    )
    try:
        from jax import shard_map

        fn = shard_map(body, check_vma=False, axis_names={data_axis}, **kw)
    except ImportError:  # pre-0.8 jax: experimental spelling, no axis_names
        from jax.experimental.shard_map import shard_map as _exp_shard_map

        auto = frozenset(n for n in mesh.axis_names if n != data_axis)
        fn = _exp_shard_map(body, check_rep=False, auto=auto, **kw)
    loss, metrics, updates, carry, grads = fn(
        trainable, state, batch, q_rng, dropout_rng
    )
    if carry is not None:
        updates = dict(updates, carry=carry)
    return loss, metrics, updates, grads


def make_eval_step(
    task: Task,
    *,
    quant: Optional[QuantSpec] = None,
    quantized_eval: bool = True,
    bits_map: Optional[Dict[str, int]] = None,
):
    """Eval step on deployment (hard-quantized) weights, as the reference
    evaluates the quantized model, not the FP master copy."""

    def eval_fn(state: TrainState, batch: Batch):
        params = state.params
        if quant is not None and quantized_eval:
            params = qt.quantize_tree_hard(params, quant, state.codebooks, bits_map)
        variables = {"params": params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        logits, updates = task.student_forward(variables, batch, False, {})
        _, metrics = task.loss_and_metrics(logits, None, batch, None)
        if "carry" in updates:
            # recurrent eval: loops.evaluate pops this and threads it into
            # the next batch (contiguous-BPTT perplexity)
            metrics = dict(metrics, carry=updates["carry"])
        return metrics

    return jax.jit(eval_fn)
