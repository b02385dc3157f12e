"""headpose_tpu — a TPU-native (JAX/XLA/Pallas) head-pose estimation framework.

A from-scratch rebuild of the capabilities of Maaz77/Head-Pose-Estimation-Model:
BlazeFace face detection with grafted yaw/pitch/roll regression heads, running
as single fused XLA programs on TPU, batched and mesh-shardable, with a full
training/eval/sweep stack for the pose-head model zoo.
"""

__version__ = "0.1.0"

from . import core
from . import models
from . import ops
from . import data
from . import utils
from . import runtime
from . import train
from . import parallel
from . import tools
from . import pretrained
from . import compat

__all__ = ["core", "models", "ops", "data", "utils", "runtime", "train",
           "parallel", "tools", "pretrained", "compat", "__version__"]
