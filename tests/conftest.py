"""Test harness configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths
(headpose_tpu.parallel) execute without TPU hardware.  This must run before
any jax backend initialization — conftest is imported first by pytest.

Note: this container pins JAX_PLATFORMS=axon (TPU tunnel) at the process
level and the plugin wins over env-var overrides, so we force the platform
through jax.config instead.
"""
import os

# APPEND to any pre-existing XLA_FLAGS — setdefault would silently drop the
# virtual-device flag (and with it the whole parallel test suite, which
# skips itself below 8 devices) whenever the caller exported e.g. a dump dir
_FLAG = "--xla_force_host_platform_device_count=8"
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + _FLAG).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pytest

REFERENCE_ROOT = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


UNIFIED_H5 = os.path.join(
    REFERENCE_ROOT, "BlazePoser/UnifiedModels/reg1-stoqa9pt-reg2-hrchr82r-selected.h5")


@pytest.fixture(scope="session")
def unified_native():
    """Session-cached native import of the production unified model —
    importing + tracing it dominates test time otherwise."""
    if not has_reference():
        pytest.skip("reference artifacts not mounted")
    from headpose_tpu.models import unified_from_h5

    return unified_from_h5(UNIFIED_H5)


@pytest.fixture(scope="session")
def production_detector(unified_native):
    """Session-cached FaceDetector at the e2e-golden capture threshold
    (reuses unified_native's one-per-session H5 import)."""
    from headpose_tpu.runtime import FaceDetector

    model, params = unified_native
    return FaceDetector(model, params, score_threshold=0.05)
