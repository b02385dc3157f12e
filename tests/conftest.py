"""Test harness configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths
(headpose_tpu.parallel) execute without TPU hardware.  This must run before
any jax backend initialization — conftest is imported first by pytest.

Note: this container pins JAX_PLATFORMS=axon (TPU tunnel) at the process
level and the plugin wins over env-var overrides, so we force the platform
through jax.config instead.
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

REFERENCE_ROOT = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)
