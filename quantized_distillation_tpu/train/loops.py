"""High-level training loops: the reference's ``train_model``/``evaluate_model``.

``fit`` runs the epoch loop around the compiled train step — data feeding,
periodic quantized-weight evaluation, metrics logging, checkpointing through
the :class:`.manager.ExperimentManager` — i.e. everything
``cnn_models/help_fun.py::train_model`` (and the NMT loop in
``translation_models/help_fun.py``) does imperatively, but with the math all
inside one jitted step.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DistillSpec, QuantSpec, TrainConfig
from ..utils.metrics import MetricsLogger, Throughput
from .manager import ExperimentManager
from .trainer import (
    Task,
    TrainState,
    build_optimizer,
    create_train_state,
    make_eval_step,
    make_train_step,
)

Batch = Dict[str, np.ndarray]


def evaluate(
    eval_step,
    state: TrainState,
    batches: Iterable[Batch],
    initial_carry=None,
) -> Dict[str, float]:
    """Aggregate eval metrics over a dataset.

    Means are weighted by batch size; ``nll_sum``/``n_tokens`` pairs (NMT)
    are summed and reported as perplexity, matching the reference's
    perplexity eval.

    ``initial_carry``: recurrent state threaded across batches for stateful
    tasks (contiguous-BPTT LM eval) — injected as ``batch["carry"]`` and
    replaced by the ``"carry"`` entry the eval step returns in its metrics.
    """
    sums: Dict[str, float] = {}
    weights: Dict[str, float] = {}
    carry = initial_carry
    for batch in batches:
        batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "index"}
        if carry is not None:
            batch["carry"] = carry
        m = dict(eval_step(state, batch))
        new_carry = m.pop("carry", None)  # drop from metrics either way
        if initial_carry is not None and new_carry is not None:
            carry = new_carry
        bs = next(iter(batch.values())).shape[0]
        for k, v in m.items():
            v = float(v)
            if k in ("nll_sum", "n_tokens"):
                sums[k] = sums.get(k, 0.0) + v
                weights[k] = 1.0
            else:
                sums[k] = sums.get(k, 0.0) + v * bs
                weights[k] = weights.get(k, 0.0) + bs
    out = {k: sums[k] / weights[k] for k in sums}
    if "nll_sum" in out and "n_tokens" in out and out["n_tokens"] > 0:
        out["perplexity"] = math.exp(min(out["nll_sum"] / out["n_tokens"], 30.0))
        del out["nll_sum"], out["n_tokens"]
    return out


def fit(
    task: Task,
    state: TrainState,
    cfg: TrainConfig,
    train_batches: Callable[[int], Iterable[Batch]],
    *,
    eval_batches: Optional[Callable[[], Iterable[Batch]]] = None,
    tx=None,
    mode: str = "weights",
    bits_map: Optional[Dict[str, int]] = None,
    logger: Optional[MetricsLogger] = None,
    manager: Optional[ExperimentManager] = None,
    model_name: Optional[str] = None,
    item_count: Callable[[Batch], int] = lambda b: next(iter(b.values())).shape[0],
    carry_reset=None,
) -> TrainState:
    """Epoch loop: train, periodically eval on hard-quantized weights,
    checkpoint per epoch. ``train_batches(epoch)`` yields numpy batches.

    ``carry_reset``: for stateful (carry-threading) tasks — the zero carry
    reinstalled at each epoch start (the data stream restarts) and used as
    the initial carry for the per-epoch eval pass."""
    logger = logger or MetricsLogger(echo=False)
    if carry_reset is not None:
        # host snapshot: each epoch installs a fresh device copy, because the
        # donated train step deletes whatever buffers were installed before
        carry_reset = jax.tree.map(np.asarray, carry_reset)
    tx = tx or build_optimizer(cfg)
    step_fn = make_train_step(
        task, tx, quant=cfg.quant, distill=cfg.distill, mode=mode, bits_map=bits_map
    )
    eval_fn = make_eval_step(task, quant=cfg.quant, bits_map=bits_map)
    rng = jax.random.PRNGKey(cfg.seed)
    thr = Throughput()
    for epoch in range(cfg.epochs):
        if carry_reset is not None:
            state = state.replace(carry=jax.tree.map(jnp.asarray, carry_reset))
        losses = []
        for batch in train_batches(epoch):
            batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "index"}
            n = item_count(batch)
            state, metrics = step_fn(state, batch, rng)
            losses.append(float(metrics["loss"]))
            thr.add(n)
            step = int(state.step)
            if cfg.log_every and step % cfg.log_every == 0:
                logger.log(
                    "train",
                    step=step,
                    epoch=epoch,
                    items_per_s=thr.per_second,
                    **{k: float(v) for k, v in metrics.items()},
                )
            if (
                cfg.eval_every
                and eval_batches is not None
                and step % cfg.eval_every == 0
            ):
                logger.log(
                    "eval",
                    step=step,
                    epoch=epoch,
                    **evaluate(
                        eval_fn, state, eval_batches(), initial_carry=carry_reset
                    ),
                )
        epoch_metrics: Dict[str, float] = {"loss": float(np.mean(losses))}
        if eval_batches is not None:
            epoch_metrics.update(
                evaluate(
                    eval_fn, state, eval_batches(), initial_carry=carry_reset
                )
            )
        logger.log("epoch", step=int(state.step), epoch=epoch, **epoch_metrics)
        if manager is not None and model_name is not None:
            manager.save(model_name, state, int(state.step))
    return state
