"""Trainer tests: STE-KD training, differentiable quantization, tree transforms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_distillation_tpu.config import DistillSpec, QuantSpec, TrainConfig
from quantized_distillation_tpu.models import make_cnn, make_seq2seq
from quantized_distillation_tpu.train import (
    build_optimizer,
    create_train_state,
    make_eval_step,
    make_train_step,
    nmt_task,
    vision_task,
)
from quantized_distillation_tpu.train import quantize_tree as qt


@pytest.fixture(scope="module")
def cnn_setup():
    student = make_cnn("student_small")
    x = jnp.zeros((8, 32, 32, 3))
    sv = student.init(jax.random.PRNGKey(1), x)
    batch = {
        "image": jax.random.normal(jax.random.PRNGKey(2), (8, 32, 32, 3)),
        "label": jnp.arange(8) % 10,
    }
    return student, sv, batch


class TestQuantizeTree:
    def test_only_matrices_quantized(self, cnn_setup):
        student, sv, _ = cnn_setup
        spec = QuantSpec(bits=2)
        q = qt.ste_quantize_tree(sv["params"], spec)
        flat_o = jax.tree_util.tree_flatten_with_path(sv["params"])[0]
        flat_q = jax.tree.leaves(q)
        for (path, orig), quant in zip(flat_o, flat_q):
            p = qt.path_str(path)
            if qt.is_quantizable(p, orig, spec):
                # 2-bit: at most 4 distinct values per bucket
                assert not np.allclose(np.asarray(orig), np.asarray(quant))
            else:
                np.testing.assert_array_equal(np.asarray(orig), np.asarray(quant))

    def test_codebook_tree_keys_match_quantizable(self, cnn_setup):
        _, sv, _ = cnn_setup
        spec = QuantSpec(bits=4, method="codebook")
        books = qt.init_codebook_tree(sv["params"], spec)
        flat = jax.tree_util.tree_flatten_with_path(sv["params"])[0]
        expect = {
            qt.path_str(p)
            for p, l in flat
            if qt.is_quantizable(qt.path_str(p), l, spec)
        }
        assert set(books) == expect
        assert all(b.shape == (16,) for b in books.values())

    def test_index_streams_and_sizes(self, cnn_setup):
        _, sv, _ = cnn_setup
        spec = QuantSpec(bits=4)
        streams = qt.index_streams(sv["params"], spec)
        sizes = qt.param_sizes(sv["params"])
        for name, s in streams.items():
            assert s.size == sizes[name]
            assert s.min() >= 0 and s.max() <= 15


class TestTrainStep:
    def test_kd_ste_training_decreases_loss(self, cnn_setup):
        student, sv, batch = cnn_setup
        teacher = make_cnn("student_medium")
        tv = teacher.init(jax.random.PRNGKey(0), batch["image"])
        quant, distill = QuantSpec(bits=4), DistillSpec()
        task = vision_task(student, teacher, tv)
        tx = build_optimizer(TrainConfig(learning_rate=3e-3))
        state = create_train_state(
            sv["params"], tx, batch_stats=sv["batch_stats"], quant=quant
        )
        step = make_train_step(task, tx, quant=quant, distill=distill, donate=False)
        rng = jax.random.PRNGKey(42)
        losses = []
        for _ in range(30):
            state, m = step(state, batch, rng)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
        # eval on hard-quantized weights learns the batch
        em = make_eval_step(task, quant=quant)(state, batch)
        assert float(em["accuracy"]) > 0.3

    def test_diffquant_freezes_weights_moves_codebooks(self, cnn_setup):
        student, sv, batch = cnn_setup
        quant = QuantSpec(bits=2, method="codebook")
        task = vision_task(student)
        tx = build_optimizer(TrainConfig(learning_rate=1e-2))
        state = create_train_state(
            sv["params"], tx, batch_stats=sv["batch_stats"], quant=quant,
            mode="codebooks",
        )
        step = make_train_step(task, tx, quant=quant, mode="codebooks", donate=False)
        p0 = jax.tree.map(lambda x: x.copy(), state.params)
        cb0 = {k: v.copy() for k, v in state.codebooks.items()}
        rng = jax.random.PRNGKey(0)
        losses = []
        for _ in range(10):
            state, m = step(state, batch, rng)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
        assert all(
            np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(state.params))
        )
        assert any(
            not np.allclose(np.asarray(cb0[k]), np.asarray(state.codebooks[k]))
            for k in cb0
        )

    def test_stochastic_rounding_mode_runs(self, cnn_setup):
        student, sv, batch = cnn_setup
        quant = QuantSpec(bits=4, stochastic=True)
        task = vision_task(student)
        tx = build_optimizer(TrainConfig())
        state = create_train_state(
            sv["params"], tx, batch_stats=sv["batch_stats"], quant=quant
        )
        step = make_train_step(task, tx, quant=quant, donate=False)
        state, m = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(m["loss"]))


class TestNMTTraining:
    def test_nmt_kd_step(self):
        student = make_seq2seq("student_small", 30, 40)
        teacher = make_seq2seq("student_small", 30, 40, hidden=160, embed_dim=160)
        src = jnp.array([[5, 6, 7, 0], [8, 9, 4, 3]], jnp.int32)
        src_len = jnp.array([3, 4], jnp.int32)
        tgt_in = jnp.array([[1, 5, 6], [1, 7, 8]], jnp.int32)
        tgt_out = jnp.array([[5, 6, 2], [7, 8, 2]], jnp.int32)
        batch = {
            "src": src, "src_len": src_len, "tgt_in": tgt_in, "tgt_out": tgt_out,
            "tgt_mask": jnp.ones_like(tgt_out, jnp.float32),
        }
        sv = student.init(jax.random.PRNGKey(1), src, src_len, tgt_in)
        tv = teacher.init(jax.random.PRNGKey(2), src, src_len, tgt_in)
        quant, distill = QuantSpec(bits=4), DistillSpec(weight=0.5, temperature=2.0)
        task = nmt_task(student, teacher, tv)
        tx = build_optimizer(TrainConfig(learning_rate=5e-3, clip_norm=5.0))
        state = create_train_state(sv["params"], tx, quant=quant)
        step = make_train_step(task, tx, quant=quant, distill=distill, donate=False)
        rng = jax.random.PRNGKey(0)
        losses = []
        for _ in range(10):
            state, m = step(state, batch, rng)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()
