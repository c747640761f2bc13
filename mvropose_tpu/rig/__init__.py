"""Realtime rig layer: camera sources, sync buffer, batched streaming loop."""

from mvropose_tpu.rig.source import CameraSource, FileReplaySource, SyntheticSource, Frame
from mvropose_tpu.rig.stream import StreamingPipeline, StreamStats
from mvropose_tpu.rig.viewer import tile_frames, draw_keypoints_overlay

__all__ = [
    "CameraSource",
    "FileReplaySource",
    "SyntheticSource",
    "Frame",
    "StreamingPipeline",
    "StreamStats",
    "tile_frames",
    "draw_keypoints_overlay",
]
