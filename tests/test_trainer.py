"""Trainer tests: STE-KD training, differentiable quantization, tree transforms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_distillation_tpu.config import DistillSpec, QuantSpec, TrainConfig
from quantized_distillation_tpu.models import make_cnn, make_seq2seq
from quantized_distillation_tpu.train import (
    build_optimizer,
    preferred_grad_reduce_dtype,
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

    @pytest.mark.parametrize("bits_map", [None, "mixed"])
    def test_fused_tree_matches_per_leaf(self, cnn_setup, bits_map):
        """The grouped one-kernel-per-bits-group fake-quant (TPU path) must
        reproduce the per-leaf jnp pipeline to 1 ulp, including mixed
        per-leaf bit widths."""
        student, sv, _ = cnn_setup
        spec = QuantSpec(bits=4)
        bm = None
        if bits_map == "mixed":
            flat = jax.tree_util.tree_flatten_with_path(sv["params"])[0]
            paths = [
                qt.path_str(p) for p, l in flat
                if qt.is_quantizable(qt.path_str(p), l, spec)
            ]
            bm = {p: (2 if i % 2 else 4) for i, p in enumerate(paths)}
        fused = qt._fused_fake_quant_values(sv["params"], spec, bm, force=True)
        assert fused is not None
        want = qt.quantize_tree_hard(sv["params"], spec, bits_map=bm)
        flat_w = jax.tree_util.tree_flatten_with_path(want)[0]
        for path, leaf in flat_w:
            p = qt.path_str(path)
            if p in fused:
                np.testing.assert_allclose(
                    np.asarray(fused[p]), np.asarray(leaf), rtol=0, atol=2e-6
                )


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

    def test_joint_mode_moves_weights_and_codebooks(self, cnn_setup):
        """mode='joint' is what wmt_distill.py --method codebook runs in
        production: BOTH the FP master weights and the codebook points must
        receive gradient, loss must fall, and hard-quantized eval must match
        quantize_tree_hard with the TRAINED codebooks."""
        student, sv, batch = cnn_setup
        quant = QuantSpec(bits=4, method="codebook")
        task = vision_task(student)
        tx = build_optimizer(TrainConfig(learning_rate=3e-3))
        state = create_train_state(
            sv["params"], tx, batch_stats=sv["batch_stats"], quant=quant,
            mode="joint",
        )
        step = make_train_step(task, tx, quant=quant, mode="joint", donate=False)
        p0 = jax.tree.map(lambda x: x.copy(), state.params)
        cb0 = {k: v.copy() for k, v in state.codebooks.items()}
        rng = jax.random.PRNGKey(0)
        losses = []
        for _ in range(30):
            state, m = step(state, batch, rng)
            losses.append(float(m["loss"]))
        assert min(losses[-3:]) < losses[0]
        # weights move (a stop_gradient regression would freeze them)...
        spec_flat = jax.tree_util.tree_flatten_with_path(p0)[0]
        moved = [
            not np.allclose(np.asarray(l), np.asarray(n))
            for (path, l), n in zip(spec_flat, jax.tree.leaves(state.params))
            if qt.is_quantizable(qt.path_str(path), l, quant)
        ]
        assert all(moved)
        # ...and so do the codebooks
        assert any(
            not np.allclose(np.asarray(cb0[k]), np.asarray(state.codebooks[k]))
            for k in cb0
        )
        # deploy parity: the eval step's hard-quantized weights are exactly
        # quantize_tree_hard(params, quant, trained codebooks)
        hard = qt.quantize_tree_hard(state.params, quant, state.codebooks)
        variables = {"params": hard, "batch_stats": state.batch_stats}
        logits, _ = task.student_forward(variables, batch, False, {})
        em = make_eval_step(task, quant=quant)(state, batch)
        _, metrics = task.loss_and_metrics(logits, None, batch, None)
        np.testing.assert_allclose(
            float(em["accuracy"]), float(metrics["accuracy"]), rtol=1e-6
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


class TestGradReduceDtype:
    """Reduced-precision gradient all-reduce (the implemented lever behind the >=85%
    scaling gate — round-2 VERDICT item 3)."""

    def _nmt_setup(self):
        # dropout=0 so the baseline jit path and the shard_map path are
        # numerically comparable (same masks); batch of 8 shards 8 ways
        student = make_seq2seq("student_small", 30, 40, dropout=0.0)
        rng = np.random.default_rng(3)
        src = jnp.asarray(rng.integers(3, 30, (8, 6)), jnp.int32)
        src_len = jnp.full((8,), 6, jnp.int32)
        tgt_in = jnp.asarray(rng.integers(3, 40, (8, 5)), jnp.int32)
        tgt_out = jnp.asarray(rng.integers(3, 40, (8, 5)), jnp.int32)
        batch = {
            "src": src, "src_len": src_len, "tgt_in": tgt_in,
            "tgt_out": tgt_out, "tgt_mask": jnp.ones_like(tgt_out, jnp.float32),
        }
        sv = student.init(jax.random.PRNGKey(1), src, src_len, tgt_in)
        task = nmt_task(student)
        return task, sv, batch

    def test_bf16_reduce_matches_f32_path(self, devices):
        from quantized_distillation_tpu.parallel.mesh import make_mesh
        from quantized_distillation_tpu.parallel.sharding import place_batch

        task, sv, batch = self._nmt_setup()
        mesh = make_mesh(data=8, model=1, devices=devices)
        quant = QuantSpec(bits=4)
        tx = build_optimizer(TrainConfig(learning_rate=1e-2, optimizer="sgd"))
        mk = lambda **kw: make_train_step(task, tx, quant=quant, donate=False, **kw)
        s0 = create_train_state(sv["params"], tx, quant=quant)
        s1 = create_train_state(sv["params"], tx, quant=quant)
        rng = jax.random.PRNGKey(0)
        sb = place_batch(batch, mesh)
        s_base, m_base = mk()(s0, sb, rng)
        s_bf16, m_bf16 = mk(mesh=mesh, grad_reduce_dtype=preferred_grad_reduce_dtype())(s1, sb, rng)
        # loss identical (computed in f32 either way)
        np.testing.assert_allclose(
            float(m_base["loss"]), float(m_bf16["loss"]), rtol=1e-5
        )
        # SGD update = lr * grad: bf16 wire adds ~0.4% relative grad noise
        for a, b in zip(jax.tree.leaves(s_base.params), jax.tree.leaves(s_bf16.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0.05, atol=1e-4
            )

    def test_wire_bytes_halve(self, devices):
        from quantized_distillation_tpu.parallel.comm import collective_budget
        from quantized_distillation_tpu.parallel.mesh import DATA_AXIS, make_mesh
        from quantized_distillation_tpu.parallel.sharding import (
            batch_pspecs, to_named,
        )
        from jax.sharding import NamedSharding, PartitionSpec as P

        task, sv, batch = self._nmt_setup()
        mesh = make_mesh(data=8, model=1, devices=devices)
        quant = QuantSpec(bits=4)
        tx = build_optimizer(TrainConfig(learning_rate=1e-2, optimizer="sgd"))
        state = create_train_state(sv["params"], tx, quant=quant)
        rng = jax.random.PRNGKey(0)
        bsh = to_named(batch_pspecs(batch), mesh)
        rep = NamedSharding(mesh, P())

        def data_bytes(step):
            c = (
                jax.jit(step.__wrapped__, donate_argnums=())
                .lower(
                    jax.tree.map(lambda x: jax.device_put(x, rep), state),
                    jax.tree.map(
                        lambda x, s: jax.device_put(x, s), batch, bsh
                    ),
                    jax.device_put(rng, rep),
                )
                .compile()
            )
            return collective_budget(c, mesh).bytes_by_axis().get(DATA_AXIS, 0)

        base = make_train_step(task, tx, quant=quant, donate=False)
        bf16 = make_train_step(
            task, tx, quant=quant, donate=False,
            mesh=mesh, grad_reduce_dtype=preferred_grad_reduce_dtype(),
        )
        b_full = data_bytes(base)
        b_half = data_bytes(bf16)
        assert b_full > 0 and b_half > 0
        # the grad all-reduce dominates: expect ~2x fewer data-axis bytes
        assert b_half < 0.65 * b_full, (b_half, b_full)

    def test_bf16_reduce_trains(self, devices):
        from quantized_distillation_tpu.parallel.mesh import make_mesh
        from quantized_distillation_tpu.parallel.sharding import place_batch

        task, sv, batch = self._nmt_setup()
        mesh = make_mesh(data=8, model=1, devices=devices)
        quant = QuantSpec(bits=4)
        tx = build_optimizer(TrainConfig(learning_rate=5e-3, clip_norm=5.0))
        state = create_train_state(sv["params"], tx, quant=quant)
        step = make_train_step(
            task, tx, quant=quant, donate=False,
            mesh=mesh, grad_reduce_dtype=preferred_grad_reduce_dtype(),
        )
        sb = place_batch(batch, mesh)
        rng = jax.random.PRNGKey(0)
        losses = []
        for _ in range(10):
            state, m = step(state, sb, rng)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()
