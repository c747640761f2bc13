"""Command-line interface: python -m mvropose_tpu.cli <command>."""

from mvropose_tpu.cli.main import main

__all__ = ["main"]
