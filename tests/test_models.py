"""Model zoo tests: shapes, param scales, decode-path consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_distillation_tpu.models import (
    make_cnn,
    make_seq2seq,
    make_wrn,
)


def n_params(variables):
    return sum(p.size for p in jax.tree.leaves(variables["params"]))


class TestCNN:
    def test_forward_shapes_and_teacher_scale(self):
        x = jnp.zeros((2, 32, 32, 3))
        teacher = make_cnn("teacher")
        v = teacher.init(jax.random.PRNGKey(0), x)
        assert teacher.apply(v, x).shape == (2, 10)
        # paper's CIFAR-10 teacher is ~5M params
        assert 4e6 < n_params(v) < 7e6

    def test_students_strictly_smaller(self):
        x = jnp.zeros((1, 32, 32, 3))
        sizes = []
        for preset in ["teacher", "student_large", "student_medium", "student_small"]:
            v = make_cnn(preset).init(jax.random.PRNGKey(0), x)
            sizes.append(n_params(v))
        assert sizes == sorted(sizes, reverse=True)

    def test_train_mode_updates_batch_stats(self):
        x = jnp.ones((4, 32, 32, 3))
        m = make_cnn("student_small")
        v = m.init(jax.random.PRNGKey(0), x)
        _, updates = m.apply(
            v, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        before = jax.tree.leaves(v["batch_stats"])
        after = jax.tree.leaves(updates["batch_stats"])
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(before, after)
        )


class TestWRN:
    def test_depth_formula(self):
        from quantized_distillation_tpu.models import WideResNet

        with pytest.raises(ValueError):
            WideResNet(depth=15, widen=2).init(
                jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
            )

    def test_forward_and_num_classes(self):
        x = jnp.zeros((2, 32, 32, 3))
        m = make_wrn("student_small", num_classes=100)
        v = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(v, x).shape == (2, 100)

    def test_wrn28_10_scale(self):
        # WRN-28-10 is ~36.5M params on CIFAR
        v = make_wrn("teacher").init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
        )
        assert 3.0e7 < n_params(v) < 4.0e7


class TestSeq2Seq:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        m = make_seq2seq("student_small", 50, 60)
        src = jnp.array([[5, 6, 7, 0], [8, 9, 0, 0]], jnp.int32)
        src_len = jnp.array([3, 2], jnp.int32)
        tgt = jnp.array([[1, 5, 6], [1, 7, 8]], jnp.int32)
        v = m.init(jax.random.PRNGKey(0), src, src_len, tgt)
        return m, v, src, src_len, tgt

    def test_forward_shape(self, model_and_vars):
        m, v, src, src_len, tgt = model_and_vars
        logits = m.apply(v, src, src_len, tgt)
        assert logits.shape == (2, 3, 60)

    def test_pad_positions_dont_affect_output(self, model_and_vars):
        # changing source tokens beyond src_len must not change logits
        m, v, src, src_len, tgt = model_and_vars
        a = m.apply(v, src, src_len, tgt)
        src2 = src.at[0, 3].set(49).at[1, 2].set(17).at[1, 3].set(23)
        b = m.apply(v, src2, src_len, tgt)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_stepwise_matches_teacher_forced(self, model_and_vars):
        # decode_step T times == decode over the T-length sequence
        m, v, src, src_len, tgt = model_and_vars
        enc_out, enc_mask, state = m.apply(v, src, src_len, method=m.encode)
        _, full_logits = m.apply(
            v, state, tgt, enc_out, enc_mask, method=m.decode
        )
        step_logits = []
        s = state
        for t in range(tgt.shape[1]):
            s, logit = m.apply(
                v, s, tgt[:, t], enc_out, enc_mask, method=m.decode_step
            )
            step_logits.append(logit)
        got = np.stack([np.asarray(l) for l in step_logits], axis=1)
        np.testing.assert_allclose(
            got, np.asarray(full_logits), rtol=1e-5, atol=1e-5
        )

    def test_bidirectional_encoder(self):
        m = make_seq2seq("student_small", 50, 60, bidirectional=True, hidden=128)
        src = jnp.array([[5, 6, 7, 0]], jnp.int32)
        v = m.init(
            jax.random.PRNGKey(0), src, jnp.array([3]), jnp.array([[1, 5]], jnp.int32)
        )
        logits = m.apply(v, src, jnp.array([3]), jnp.array([[1, 5]], jnp.int32))
        assert logits.shape == (1, 2, 60)


class TestResNet:
    def test_imagenet_shapes_and_param_count(self):
        from quantized_distillation_tpu.models import make_resnet

        x = jnp.zeros((1, 64, 64, 3))
        m = make_resnet("resnet18")
        v = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(v, x).shape == (1, 1000)
        # stock ResNet-18 is ~11.7M params
        assert 10e6 < n_params(v) < 13e6

    def test_width_students_smaller_and_runnable(self):
        from quantized_distillation_tpu.models import make_resnet

        x = jnp.zeros((2, 32, 32, 3))
        sizes = []
        for preset in ["resnet18", "resnet18_half", "resnet18_quarter"]:
            m = make_resnet(preset, num_classes=10, small_inputs=True)
            v = m.init(jax.random.PRNGKey(0), x)
            assert m.apply(v, x).shape == (2, 10)
            sizes.append(n_params(v))
        assert sizes == sorted(sizes, reverse=True)

    def test_bottleneck_variant(self):
        from quantized_distillation_tpu.models import make_resnet

        x = jnp.zeros((1, 32, 32, 3))
        m = make_resnet("resnet50", num_classes=10, small_inputs=True)
        v = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(v, x).shape == (1, 10)

    def test_quantized_kd_train_step(self):
        from quantized_distillation_tpu.config import DistillSpec, QuantSpec, TrainConfig
        from quantized_distillation_tpu.models import make_resnet
        from quantized_distillation_tpu.train import (
            build_optimizer,
            create_train_state,
            make_train_step,
            vision_task,
        )

        x = jnp.ones((4, 32, 32, 3))
        y = jnp.zeros((4,), jnp.int32)
        teacher = make_resnet("resnet18", num_classes=10, small_inputs=True)
        student = make_resnet("resnet18_quarter", num_classes=10, small_inputs=True)
        tv = teacher.init(jax.random.PRNGKey(0), x)
        sv = student.init(jax.random.PRNGKey(1), x)
        quant = QuantSpec(bits=4)
        task = vision_task(student, teacher, tv)
        tx = build_optimizer(TrainConfig(learning_rate=1e-3))
        state = create_train_state(
            sv["params"], tx, batch_stats=sv["batch_stats"], quant=quant
        )
        step = make_train_step(task, tx, quant=quant, distill=DistillSpec())
        state, m = step(state, {"image": x, "label": y}, jax.random.PRNGKey(2))
        assert np.isfinite(float(m["loss"]))
