"""Numeric sanitizer tests: NaN sweeps, checkify wrapping, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_distillation_tpu.utils.debug import (
    assert_deterministic,
    checked,
    find_nonfinite,
    grad_health,
)


def test_find_nonfinite_names_leaves():
    tree = {
        "ok": jnp.ones((3,)),
        "bad": {"w": jnp.array([1.0, jnp.nan]), "b": jnp.array([jnp.inf])},
        "ints": jnp.ones((2,), jnp.int32),  # ints never flagged
    }
    bad = find_nonfinite(tree)
    assert sorted(bad) == ["bad/b", "bad/w"]
    assert find_nonfinite({"x": jnp.zeros(2)}) == []


def test_checked_raises_on_nan():
    def f(x):
        return jnp.log(x)  # log(-1) -> nan

    g = checked(f)
    np.testing.assert_allclose(g(jnp.asarray([1.0])), [0.0])
    with pytest.raises(Exception) as ei:
        g(jnp.asarray([-1.0]))
    assert "nan" in str(ei.value).lower()


def test_checked_on_quantized_train_step():
    # the real fake-quant step passes float checks on sane inputs
    from quantized_distillation_tpu.config import QuantSpec
    from quantized_distillation_tpu.ops.uniform import ste_fake_quant

    def step(w):
        q = ste_fake_quant(w, 4)
        return jnp.sum(q * q)

    w = jax.random.normal(jax.random.PRNGKey(0), (300,))
    out = checked(step)(w)
    assert np.isfinite(float(out))


def test_assert_deterministic_passes_on_jitted_step():
    @jax.jit
    def f(x):
        return {"y": jnp.cumsum(x) * 3.0, "z": jnp.sum(x)}

    assert_deterministic(f, jnp.arange(16, dtype=jnp.float32))


def test_assert_deterministic_catches_mutation():
    counter = {"n": 0}

    def f(x):
        counter["n"] += 1
        return x + counter["n"]

    with pytest.raises(AssertionError):
        assert_deterministic(f, jnp.ones((4,)))


def test_grad_health():
    g = {"a": jnp.asarray([3.0, 4.0]), "b": jnp.zeros((2,))}
    h = grad_health(g)
    assert h["norm"] == pytest.approx(5.0)
    assert h["max_abs"] == pytest.approx(4.0)
    assert h["nonfinite"] == 0.0
