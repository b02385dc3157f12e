"""headpose_tpu — a TPU-native (JAX/XLA/Pallas) head-pose estimation framework.

A from-scratch rebuild of the capabilities of Maaz77/Head-Pose-Estimation-Model:
BlazeFace face detection with grafted yaw/pitch/roll regression heads, running
as single fused XLA programs on TPU, batched and mesh-shardable, with a full
training/eval/sweep stack for the pose-head model zoo.

Submodules load lazily (PEP 562): `import headpose_tpu` costs nothing beyond
this file, and `headpose_tpu.tools.aot` serving hosts never pull in the model/
training stack (tests/test_aot.py::test_loader_imports_no_model_code).
"""
import importlib

__version__ = "0.1.0"

_SUBMODULES = ("core", "models", "ops", "data", "utils", "runtime", "train",
               "parallel", "tools", "pretrained", "compat")

__all__ = [*_SUBMODULES, "__version__"]


def __getattr__(name: str):
    if name in _SUBMODULES:
        module = importlib.import_module(f".{name}", __name__)
        globals()[name] = module          # cache: __getattr__ runs once
        return module
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(__all__)
