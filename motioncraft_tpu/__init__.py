"""motioncraft_tpu — a TPU-native (JAX/XLA/Pallas/pjit) whole-body motion
generation framework with the capabilities of cure-lab/MotionCraft.

Layer map (mirrors SURVEY.md §1 of the reference, re-designed TPU-first):
  config/registry   -> motioncraft_tpu.config / motioncraft_tpu.registry
  diffusion engine  -> motioncraft_tpu.diffusion (scan-compiled loops)
  denoisers/ops     -> motioncraft_tpu.models / motioncraft_tpu.ops
  data              -> motioncraft_tpu.data
  evaluation        -> motioncraft_tpu.eval
  parallelism       -> motioncraft_tpu.parallel (mesh/pjit/shard_map)
  apis/tools        -> motioncraft_tpu.apis, tools/
"""

__version__ = "0.1.0"

from . import registry  # noqa: F401
from .config import Config  # noqa: F401
