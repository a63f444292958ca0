"""Test configuration: force the CPU backend with 8 virtual devices so the
multi-chip sharding paths compile and run without TPU hardware."""

import os
import sys

# In axon-tunnel environments a sitecustomize registers a remote TPU backend
# at interpreter start and force-sets jax_platforms="axon,cpu" (overriding
# the JAX_PLATFORMS env var). Tests must run on the local CPU backend: clear
# the trigger for any subprocesses, force the env var, and — if jax was
# already imported by sitecustomize — override the config directly.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def refdir():
    return REFERENCE
