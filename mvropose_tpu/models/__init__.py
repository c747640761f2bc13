"""Flax model zoo: ViT backbone, CNN stem, keypoint/angle heads, fusion.

Architecturally equivalent to the reference estimators
(/root/reference/model/DREAM_Train.py:133-341 single-view,
/root/reference/model/MvRoPose_FR3.py:326-627 multi-view) but designed
TPU-first:
  * NHWC layouts, bf16 compute / f32 params, static shapes everywhere.
  * Multi-view batches are dense (B, V_max, ...) tensors with a boolean view
    mask threaded into fusion attention and losses - replacing the
    reference's dict-of-views + zero-dummy-image padding
    (/root/reference/model/MvRoPose_FR3.py:949-967).
  * The stateful view registry of the reference (view_to_idx mutated inside
    forward, MvRoPose_FR3.py:594-598) becomes a static serial->index table.
"""

from mvropose_tpu.models.vit import ViTBackbone, ViTConfig
from mvropose_tpu.models.stem import LightCNNStem
from mvropose_tpu.models.heads import (
    TokenFuser,
    FusedUpsampleBlock,
    UNetViTKeypointHead,
    JointAngleHead,
)
from mvropose_tpu.models.fusion import MultiViewFusion, SelfAttentionFusion, TransformerDecoderLayer
from mvropose_tpu.models.estimator import (
    EstimatorConfig,
    GeometricAngleHead,
    SingleViewPoseEstimator,
    MultiViewPoseEstimator,
)

__all__ = [
    "ViTBackbone",
    "ViTConfig",
    "LightCNNStem",
    "TokenFuser",
    "FusedUpsampleBlock",
    "UNetViTKeypointHead",
    "JointAngleHead",
    "MultiViewFusion",
    "SelfAttentionFusion",
    "TransformerDecoderLayer",
    "EstimatorConfig",
    "GeometricAngleHead",
    "SingleViewPoseEstimator",
    "MultiViewPoseEstimator",
]
