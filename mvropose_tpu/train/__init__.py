"""Training layer: losses, metrics, train state, sharded step functions."""

from mvropose_tpu.train.losses import (
    heatmap_mse_loss,
    masked_multiview_heatmap_loss,
    smooth_l1_loss,
    fk_consistency_loss,
)
from mvropose_tpu.train.metrics import (
    pck_at_k,
    add_metric,
    add_auc,
    angle_mae,
    pose_rotation_err_deg,
    pose_translation_err_m,
)
from mvropose_tpu.train.state import TrainState, create_train_state, TrainConfig
from mvropose_tpu.train.step import (
    make_single_view_train_step,
    make_multi_view_train_step,
    make_eval_step,
)

__all__ = [
    "heatmap_mse_loss",
    "masked_multiview_heatmap_loss",
    "smooth_l1_loss",
    "fk_consistency_loss",
    "pck_at_k",
    "add_metric",
    "add_auc",
    "angle_mae",
    "pose_rotation_err_deg",
    "pose_translation_err_m",
    "TrainState",
    "TrainConfig",
    "create_train_state",
    "make_single_view_train_step",
    "make_multi_view_train_step",
    "make_eval_step",
]
