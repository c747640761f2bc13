"""Shared utilities: metric writer, stage timing, config helpers."""

from mvropose_tpu.utils.metrics_writer import MetricWriter
from mvropose_tpu.utils.timing import StageTimer

__all__ = ["MetricWriter", "StageTimer"]
