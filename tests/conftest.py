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
def production_detector():
    """Session-cached FaceDetector at the e2e-golden capture threshold."""
    if not has_reference():
        pytest.skip("reference artifacts not mounted")
    from headpose_tpu.runtime import FaceDetector

    model, params = __import__("headpose_tpu.models", fromlist=["unified_from_h5"]
                               ).unified_from_h5(UNIFIED_H5)
    return FaceDetector(model, params, score_threshold=0.05)
