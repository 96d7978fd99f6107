"""Tests: automatic bit assignment, fit/evaluate loops, metrics logger."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_distillation_tpu.config import QuantSpec, TrainConfig
from quantized_distillation_tpu.models import make_cnn
from quantized_distillation_tpu.train import (
    build_optimizer,
    create_train_state,
    vision_task,
)
from quantized_distillation_tpu.train.bits import assign_bits, gradient_sensitivities
from quantized_distillation_tpu.train.loops import fit
from quantized_distillation_tpu.train.manager import ExperimentManager
from quantized_distillation_tpu.utils.metrics import MetricsLogger


class TestAssignBits:
    def test_budget_respected_and_sensitivity_ordered(self):
        sizes = {"a": 1000, "b": 1000, "c": 1000, "d": 1000}
        sens = {"a": 10.0, "b": 5.0, "c": 1.0, "d": 0.1}
        bits = assign_bits(sizes, sens, target_mean_bits=4.0)
        mean = sum(sizes[n] * bits[n] for n in sizes) / sum(sizes.values())
        assert mean <= 4.0 + 1e-9
        # more sensitive layers never get fewer bits
        assert bits["a"] >= bits["b"] >= bits["c"] >= bits["d"]
        assert bits["a"] == 8  # budget allows top layers to max out

    def test_tight_budget_floors_everything(self):
        bits = assign_bits({"a": 10, "b": 10}, {"a": 1.0, "b": 2.0}, 2.0)
        assert bits == {"a": 2, "b": 2}

    def test_loose_budget_maxes_everything(self):
        bits = assign_bits({"a": 10, "b": 10}, {"a": 1.0, "b": 2.0}, 8.0)
        assert bits == {"a": 8, "b": 8}

    def test_gradient_sensitivities_shapes(self):
        model = make_cnn("student_small")
        x = jnp.zeros((4, 32, 32, 3))
        v = model.init(jax.random.PRNGKey(0), x)
        spec = QuantSpec(bits=4)

        def loss(params, batch):
            logits = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                batch["image"], train=False,
            )
            from quantized_distillation_tpu.train.losses import cross_entropy
            return cross_entropy(logits, batch["label"])

        batch = {"image": jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3)),
                 "label": jnp.arange(4) % 10}
        sens = gradient_sensitivities(loss, v["params"], [batch, batch], spec)
        assert sens and all(s >= 0 for s in sens.values())
        # only quantizable (>=2D, non-excluded) leaves appear
        assert all("bias" not in k for k in sens)

    def test_known_sensitive_layer_wins_bits(self):
        """A layer the loss depends on strongly must receive more bits than a
        near-dead layer, end to end through sensitivities -> assign_bits."""
        import flax.linen as nn

        class TwoBranch(nn.Module):
            @nn.compact
            def __call__(self, x):
                hot = nn.Dense(16, name="hot")(x)
                cold = nn.Dense(16, name="cold")(x)
                return hot + 1e-3 * cold

        model = TwoBranch()
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 16))
        params = model.init(jax.random.PRNGKey(1), x)["params"]
        spec = QuantSpec(bits=4)

        def loss(p, batch):
            return jnp.mean((model.apply({"params": p}, batch["x"]) - batch["y"]) ** 2)

        batch = {"x": x, "y": jax.random.normal(jax.random.PRNGKey(2), (8, 16))}
        sens = gradient_sensitivities(loss, params, [batch], spec)
        assert sens["hot/kernel"] > sens["cold/kernel"]
        from quantized_distillation_tpu.train.quantize_tree import param_sizes
        bits = assign_bits(param_sizes(params), sens, target_mean_bits=5.0)
        assert bits["hot/kernel"] > bits["cold/kernel"]


class TestFitLoop:
    def test_fit_trains_evals_checkpoints(self, tmp_path):
        model = make_cnn("student_small")
        x0 = jnp.zeros((1, 32, 32, 3))
        v = model.init(jax.random.PRNGKey(0), x0)
        quant = QuantSpec(bits=4)
        cfg = TrainConfig(epochs=2, learning_rate=3e-3, log_every=2, quant=quant)
        task = vision_task(model)
        tx = build_optimizer(cfg)
        state = create_train_state(
            v["params"], tx, batch_stats=v["batch_stats"], quant=quant
        )
        rng = np.random.default_rng(0)
        data = {
            "image": rng.standard_normal((64, 32, 32, 3)).astype(np.float32),
            "label": (rng.integers(0, 10, 64)).astype(np.int32),
        }

        def stream(epoch):
            for i in range(0, 64, 16):
                yield {k: v[i : i + 16] for k, v in data.items()}

        mgr = ExperimentManager(str(tmp_path))
        mgr.add_new_model("m")
        log_path = str(tmp_path / "metrics.jsonl")
        logger = MetricsLogger(log_path, echo=False)
        state = fit(
            task, state, cfg, stream, eval_batches=lambda: stream(0),
            tx=tx, logger=logger, manager=mgr, model_name="m",
        )
        assert int(state.step) == 8
        assert mgr.latest_step("m") == 8
        events = [json.loads(l) for l in open(log_path)]
        kinds = {e["event"] for e in events}
        assert "train" in kinds and "epoch" in kinds
        epochs = [e for e in events if e["event"] == "epoch"]
        assert len(epochs) == 2
        assert "accuracy" in epochs[-1]
        # loss decreased across epochs
        assert epochs[-1]["loss"] < epochs[0]["loss"]
