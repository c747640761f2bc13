"""Train state: params + batch stats + two-group optimizer.

The reference trains with TWO AdamW optimizers over disjoint parameter groups
(keypoint path vs angle head) and two cosine schedules
(/root/reference/model/MvRoPose_FR3.py:977-982, DREAM_Train.py:793-796).
Here that is one `optax.multi_transform` over labeled param groups - a single
functional update, same semantics, and the frozen backbone is a third group
mapped to `optax.set_to_zero()` (instead of relying on stop_gradient alone).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

# Module names making up the keypoint path in each estimator, per the
# reference's param split (MvRoPose_FR3.py:978).
KPT_MODULES = ("cnn_stem", "view_embeddings", "fusion_module", "keypoint_enricher", "keypoint_head")
ANG_MODULES = ("angle_head",)
FROZEN_MODULES = ("backbone",)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    num_epochs: int = 100
    steps_per_epoch: int = 100
    lr_kpt: float = 1e-4
    lr_ang: float = 1e-4
    eta_min: float = 1e-6
    loss_weight_kpt: float = 100.0
    # FK-consistency term weight (0 disables). When on, the single-view step
    # projects FK(pred angles) through each sample's extrinsics and penalizes
    # distance to the GT 2D keypoints - the differentiable closure the
    # reference only prototyped (MV-model.ipynb cell 6 robot_pose_loss).
    loss_weight_fk: float = 0.0
    angle_beta: float = 1.0
    weight_decay: float = 0.0  # torch AdamW default is 0.01; reference used default
    freeze_backbone: bool = True

    @property
    def total_steps(self) -> int:
        return self.num_epochs * self.steps_per_epoch


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Any = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def _label_params(params, freeze_backbone: bool = True) -> Any:
    """Label each top-level module: 'kpt' | 'ang' | 'frozen'.

    With freeze_backbone=False the backbone joins the keypoint group (the
    reference's from-scratch ablation mode; also what the synthetic
    convergence runs use, since no pretrained weights exist offline)."""

    known = set(KPT_MODULES) | set(ANG_MODULES) | set(FROZEN_MODULES)

    def label_for(name: str) -> str:
        # Unknown top-level modules are a hard error, not a silent default:
        # a renamed/new module would otherwise train under the kpt learning
        # rate (and unfrozen) with no symptom.
        if name not in known:
            raise ValueError(
                f"param module '{name}' is not in any optimizer group "
                f"(known: {sorted(known)}); add it to KPT_MODULES/"
                "ANG_MODULES/FROZEN_MODULES in train/state.py"
            )
        if freeze_backbone and name in FROZEN_MODULES:
            return "frozen"
        if name in ANG_MODULES:
            return "ang"
        return "kpt"

    return {
        name: jax.tree_util.tree_map(lambda _: label_for(name), subtree)
        for name, subtree in params.items()
    }


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    def cosine(lr):
        return optax.cosine_decay_schedule(
            init_value=lr, decay_steps=cfg.total_steps, alpha=cfg.eta_min / lr
        )

    adamw = lambda lr: optax.adamw(cosine(lr), weight_decay=cfg.weight_decay)
    return optax.multi_transform(
        {
            "kpt": adamw(cfg.lr_kpt),
            "ang": adamw(cfg.lr_ang),
            "frozen": optax.set_to_zero(),
        },
        lambda params: _label_params(params, cfg.freeze_backbone),
    )


def create_train_state(model, variables: Mapping, cfg: TrainConfig) -> TrainState:
    params = variables["params"]
    if isinstance(params, FrozenDict):
        params = params.unfreeze()
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )
