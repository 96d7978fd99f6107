"""Experiment-manager tests: registry ledger + orbax checkpoint roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_distillation_tpu.config import QuantSpec, TrainConfig
from quantized_distillation_tpu.models import make_cnn
from quantized_distillation_tpu.train import (
    build_optimizer,
    create_train_state,
    make_train_step,
    vision_task,
)
from quantized_distillation_tpu.train.manager import ExperimentManager


class TestRegistry:
    def test_add_list_runs(self, tmp_path):
        mgr = ExperimentManager(str(tmp_path))
        mgr.add_new_model("m1", {"bits": 4})
        assert mgr.has_model("m1") and mgr.list_models() == ["m1"]
        assert mgr.get_config("m1") == {"bits": 4}
        mgr.record_run("m1", "train", {"lr": 1e-3}, {"acc": 0.9})
        mgr.record_run("m1", "diffquant", {"bits": 2})
        assert mgr.num_training_runs("m1") == 2
        assert mgr.get_runs("m1")[0]["results"]["acc"] == 0.9

    def test_duplicate_raises(self, tmp_path):
        mgr = ExperimentManager(str(tmp_path))
        mgr.add_new_model("m")
        with pytest.raises(ValueError):
            mgr.add_new_model("m")

    def test_persistence_across_instances(self, tmp_path):
        ExperimentManager(str(tmp_path)).add_new_model("m", {"x": 1})
        mgr2 = ExperimentManager(str(tmp_path))
        assert mgr2.has_model("m")
        assert mgr2.get_config("m") == {"x": 1}


class TestCheckpoint:
    def test_state_roundtrip_and_resume(self, tmp_path):
        student = make_cnn("student_small")
        x = jnp.zeros((4, 32, 32, 3))
        sv = student.init(jax.random.PRNGKey(0), x)
        quant = QuantSpec(bits=4)
        task = vision_task(student)
        tx = build_optimizer(TrainConfig())
        state = create_train_state(
            sv["params"], tx, batch_stats=sv["batch_stats"], quant=quant
        )
        step = make_train_step(task, tx, quant=quant, donate=False)
        batch = {
            "image": jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3)),
            "label": jnp.arange(4) % 10,
        }
        for _ in range(3):
            state, _ = step(state, batch, jax.random.PRNGKey(2))

        mgr = ExperimentManager(str(tmp_path))
        mgr.add_new_model("cnn")
        mgr.save("cnn", state, int(state.step))
        assert mgr.latest_step("cnn") == 3

        fresh = create_train_state(
            sv["params"], tx, batch_stats=sv["batch_stats"], quant=quant
        )
        restored = mgr.restore("cnn", fresh)
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # training continues from the restored state
        restored, m = step(restored, batch, jax.random.PRNGKey(2))
        assert int(restored.step) == 4
        assert np.isfinite(float(m["loss"]))

    def test_restore_missing_raises(self, tmp_path):
        mgr = ExperimentManager(str(tmp_path))
        mgr.add_new_model("empty")
        with pytest.raises(FileNotFoundError):
            mgr.restore("empty", {"a": jnp.zeros(3)})

    def test_resume_or_register_is_config_aware(self, tmp_path):
        """Resume only when the registered run config matches: a stale
        checkpoint trained under different flags must trigger a retrain
        (round-4 finding: blind resume-by-name poisoned a distillation)."""
        mgr = ExperimentManager(str(tmp_path))
        cfg = {"epochs": 2, "lr": 1e-3, "workdir": "/a"}
        # unknown model: registers, asks to train
        assert mgr.resume_or_register("m", cfg) is False
        # registered but no checkpoint yet: still train
        assert mgr.resume_or_register("m", cfg) is False
        mgr.save("m", {"w": jnp.zeros(3)}, 5)
        # same config (volatile workdir differs): resume
        assert mgr.resume_or_register("m", dict(cfg, workdir="/b")) is True
        # changed config: retrain and re-register; the stale pointer is
        # DROPPED immediately (round-4 advisor finding: if the retrain dies
        # before its first save, a later same-config invocation must not
        # silently restore the old-config checkpoint)
        assert mgr.resume_or_register("m", dict(cfg, epochs=9)) is False
        assert mgr.get_config("m")["epochs"] == 9
        assert mgr.latest_step("m") is None
        # interrupted-retrain scenario: same new config, still no checkpoint
        # under it -> must train again, not resume the poisoned one
        assert mgr.resume_or_register("m", dict(cfg, epochs=9)) is False
        # only after a save under the new config does resume kick in
        mgr.save("m", {"w": jnp.ones(3)}, 2)
        assert mgr.resume_or_register("m", dict(cfg, epochs=9)) is True
