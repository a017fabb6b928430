"""Cross-cutting utilities: profiling, configuration."""

from musicfpaugment_tpu.utils.config import TrainConfig, parse_into
from musicfpaugment_tpu.utils.profiling import StageTimer, annotate, trace

__all__ = ["TrainConfig", "parse_into", "StageTimer", "annotate", "trace"]
