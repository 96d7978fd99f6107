"""Tensor-parallel LM training on the fake 8-device mesh (place_params_lm)."""

import jax
import jax.numpy as jnp
import numpy as np

from quantized_distillation_tpu.config import DistillSpec, QuantSpec, TrainConfig
from quantized_distillation_tpu.models import make_lm
from quantized_distillation_tpu.parallel import (
    make_mesh,
    place_batch,
    place_params_lm,
)
from quantized_distillation_tpu.train import (
    build_optimizer,
    create_train_state,
    lm_task,
    make_train_step,
)


def test_sharded_lm_train_step():
    mesh = make_mesh(model=2)
    vocab, hidden = 64, 32
    model = make_lm("student_small", vocab, hidden=hidden, embed_dim=hidden)
    toks = jnp.ones((8, 6), jnp.int32)
    v = model.init(jax.random.PRNGKey(0), toks)
    params = place_params_lm(v["params"], mesh)

    # gate kernels and generator must actually shard over `model`
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    sharded = [
        "/".join(str(getattr(p, "key", p)) for p in path)
        for path, leaf in flat
        if not leaf.sharding.is_fully_replicated
    ]
    assert any("generator" in s for s in sharded)
    # gate kernels (flax auto-names the RNN cell OptimizedLSTMCell_<i>)
    assert any(s.endswith("ii/kernel") for s in sharded)
    assert any("embedding" in s for s in sharded)

    quant = QuantSpec(bits=4)
    task = lm_task(model)
    tx = build_optimizer(TrainConfig(learning_rate=1e-3, clip_norm=5.0))
    state = create_train_state(params, tx, quant=quant)
    step = make_train_step(task, tx, quant=quant, distill=DistillSpec(weight=0.0))
    batch = place_batch(
        {
            "input": np.ones((8, 6), np.int32),
            "target": np.ones((8, 6), np.int32),
        },
        mesh,
    )
    rng = jax.device_put(
        jax.random.PRNGKey(0),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
    )
    state, m = step(state, batch, rng)
    assert np.isfinite(float(m["loss"]))
