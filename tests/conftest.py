"""Test harness: run everything on CPU with 8 fake devices.

This exercises all mesh/pjit/shard_map logic without TPU hardware
(SURVEY.md §4 item 3).

Two environment fixes, both applied before jax does any work:

1. The container's ``sitecustomize`` (``/root/.axon_site`` on PYTHONPATH)
   registers a tunneled TPU PJRT plugin that adds ~2s of network round-trip
   to every XLA compilation — even CPU-backend ones. Unit tests compile
   hundreds of tiny programs, so when that hook is present we respawn pytest
   once as a subprocess with PYTHONPATH scrubbed (pure local CPU compiles,
   ~20x faster suite). Respawn happens in ``pytest_configure`` with global
   capture suspended so the child's output reaches the real stdout.
2. ``JAX_PLATFORMS`` is pinned to cpu and the host platform is split into 8
   fake devices so sharding tests have a mesh to run on.
"""

import os
import subprocess
import sys

_AXON_SITE = ".axon_site"
_REEXEC_FLAG = "QDT_TEST_REEXEC"


def _needs_respawn() -> bool:
    return (
        _AXON_SITE in os.environ.get("PYTHONPATH", "")
        and os.environ.get(_REEXEC_FLAG) != "1"
    )


def pytest_configure(config):
    if not _needs_respawn():
        return
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and _AXON_SITE not in p
    )
    env[_REEXEC_FLAG] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    capman = config.pluginmanager.get_plugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=False)
    args = list(config.invocation_params.args)
    rc = subprocess.call([sys.executable, "-m", "pytest"] + args, env=env)
    os._exit(rc)


if not _needs_respawn():
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    import jax

    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 fake CPU devices, got {devs}"
    return devs


@pytest.fixture
def rng():
    return np.random.default_rng(0)
