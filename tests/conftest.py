# Tests run on the XLA CPU backend with 8 virtual devices so that the
# multi-chip sharding paths (jax.sharding.Mesh over ICI) are exercised without
# TPU pod hardware. Bench/entry paths run on the real TPU chip instead.
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Label for the per-backend compile cache (utils/jax_setup.py).
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# Force the CPU backend. The session env pins JAX_PLATFORMS to the TPU plugin
# and the plugin ignores the env var, so use the config API.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
