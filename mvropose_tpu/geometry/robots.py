"""Robot specifications and batched forward kinematics.

One declarative spec per robot family replaces the per-script constant
duplication of the reference:
  * FR3   - Craig modified DH, 7 joints in radians, 8 keypoints
            (/root/reference/model/MvRoPose_FR3.py:90-131)
  * FR5   - standard DH, 6 joints in DEGREES, 7 keypoints, per-view base
            rotations (/root/reference/model/Fr5_model_train.ipynb cell 2)
  * Meca500 - standard DH with theta offsets, 6 joints in DEGREES, 7 keypoints
            (/root/reference/visualization/Meca500_vis.ipynb cell 0)
  * DREAM panda - keypoints come from the dataset; FK spec provided for the
            PnP serve path (panda shares the FR3 kinematic chain).

Degrees-vs-radians is a first-class field of the spec (`angle_unit`) because
it is the reference's most dangerous implicit convention (FR5/Meca joints are
degrees, FR3 radians).

`forward_kinematics` is a pure jnp function: jit/vmap/grad all work, so the
FK chain can be used as a differentiable supervision layer (the
FK-consistency loss sketched in /root/reference/model/MV-model.ipynb cell 6).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mvropose_tpu.geometry.dh import modified_dh_matrix, standard_dh_matrix
from mvropose_tpu.geometry.rotations import euler_zyx_deg_to_matrix


@dataclasses.dataclass(frozen=True)
class RobotSpec:
    """Declarative kinematic description of one robot family.

    dh_params rows are (a_m, d_m, alpha_deg, theta_offset_deg); one row per
    actuated joint. Keypoints are [base] + one per joint => n_joints + 1
    keypoints for standard-DH robots. For FR3 the reference defines 8 DH rows
    but only iterates the 7 actuated joints, giving 8 keypoints (base + J1..J7)
    - we reproduce exactly that (MvRoPose_FR3.py:121-129).
    """

    name: str
    convention: str  # "standard" | "modified"
    dh_params: Tuple[Tuple[float, float, float, float], ...]
    angle_unit: str  # "rad" | "deg" - unit of the *joint log / model* angles
    # Per-view base correction rotations, as extrinsic-zyx euler degrees.
    view_base_rotations_zyx_deg: Dict[str, Tuple[float, float, float]]
    # Unit of the rvec stored in this robot's aruco_pose_summary.json.
    extrinsic_rvec_unit: str = "rad"
    # Keypoint skeleton links (index pairs) for visualization / ADD.
    links: Tuple[Tuple[int, int], ...] = ()
    # Which FK chain origins the robot's KEYPOINT set corresponds to, when it
    # is not the full [base]+joints chain. DREAM ships 7 named link keypoints
    # while the panda chain has 8 origins; the PnP serve path must pair
    # heatmap channel k with FK origin keypoint_fk_indices[k]
    # (sync/DREAM_sync.py:18 names vs MvRoPose_FR3.py FK). None = identity.
    keypoint_fk_indices: Tuple[int, ...] | None = None
    # Trailing dh_params rows with NO actuated joint (theta = offset only):
    # fixed links like the franka flange (d=0.107 after joint 7) that carry a
    # keypoint frame but consume no angle. FK takes n_joints angles and still
    # emits an origin per row.
    n_passive_rows: int = 0

    def __hash__(self):
        # Explicit hash (the dict field defeats the frozen-dataclass default)
        # so a RobotSpec can be a jit static argument.
        return hash(
            (self.name, self.convention, self.dh_params, self.angle_unit,
             self.keypoint_fk_indices, self.n_passive_rows)
        )

    @property
    def n_joints(self) -> int:
        return len(self.dh_params) - self.n_passive_rows

    @property
    def n_keypoints(self) -> int:
        if self.keypoint_fk_indices is not None:
            return len(self.keypoint_fk_indices)
        return len(self.dh_params) + 1

    def keypoints_from_fk(self, fk_points: jnp.ndarray) -> jnp.ndarray:
        """Select the keypoint set from FK chain origins (..., rows+1, 3)."""
        if self.keypoint_fk_indices is None:
            return fk_points
        return fk_points[..., jnp.asarray(self.keypoint_fk_indices), :]

    def base_rotation(self, view: str | None) -> np.ndarray:
        """(3, 3) base correction matrix for a named view (identity if none)."""
        if view is None or view not in self.view_base_rotations_zyx_deg:
            return np.eye(3, dtype=np.float32)
        angles = self.view_base_rotations_zyx_deg[view]
        return np.asarray(euler_zyx_deg_to_matrix(jnp.asarray(angles, dtype=jnp.float32)))


# Franka Research 3: Craig modified DH. The 8th row (flange) exists in the
# reference table but is never reached by the 7-angle loop - omitted here on
# purpose so keypoint counts match the reference exactly.
FR3 = RobotSpec(
    name="fr3",
    convention="modified",
    dh_params=(
        (0.0, 0.333, 0.0, 0.0),
        (0.0, 0.0, -90.0, 0.0),
        (0.0, 0.316, 90.0, 0.0),
        (0.0825, 0.0, 90.0, 0.0),
        (-0.0825, 0.384, -90.0, 0.0),
        (0.0, 0.0, 90.0, 0.0),
        (0.088, 0.0, 90.0, 0.0),
    ),
    angle_unit="rad",
    view_base_rotations_zyx_deg={
        "view1": (90.0, 180.0, 0.0),
        "view2": (90.0, 180.0, 0.0),
        "view3": (90.0, 180.0, 0.0),
        "view4": (90.0, 180.0, 0.0),
    },
    extrinsic_rvec_unit="rad",
    links=((0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7)),
)

# Fairino FR5: standard DH, joint logs in degrees.
FR5 = RobotSpec(
    name="fr5",
    convention="standard",
    dh_params=(
        (0.0, 0.152, 90.0, 0.0),
        (-0.425, 0.0, 0.0, 0.0),
        (-0.395, 0.0, 0.0, 0.0),
        (0.0, 0.102, 90.0, 0.0),
        (0.0, 0.102, -90.0, 0.0),
        (0.0, 0.100, 0.0, 0.0),
    ),
    angle_unit="deg",
    view_base_rotations_zyx_deg={
        "top": (-85.0, 0.0, 180.0),
        "left": (180.0, 0.0, 90.0),
        "right": (0.0, 0.0, 90.0),
    },
    extrinsic_rvec_unit="deg",
    links=((0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6)),
)

# Mecademic Meca500: standard DH with a -90 deg theta offset on joint 2.
MECA500 = RobotSpec(
    name="meca500",
    convention="standard",
    dh_params=(
        (0.0, 0.135, -90.0, 0.0),
        (0.135, 0.0, 0.0, -90.0),
        (0.038, 0.0, -90.0, 0.0),
        (0.0, 0.120, 90.0, 0.0),
        (0.0, 0.0, -90.0, 0.0),
        (0.0, 0.070, 0.0, 0.0),
    ),
    angle_unit="deg",
    view_base_rotations_zyx_deg={},
    extrinsic_rvec_unit="deg",
    links=((0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6)),
)

# DREAM "panda": dataset ships precomputed 2D/3D keypoints, and the panda
# chain is kinematically the FR3 chain; reuse it for the PnP serve path.
# The 7 DREAM keypoint names (panda_link0/2/3/4/6/7/hand, sync/DREAM_sync.py)
# map onto the 8-origin chain by a fixed assignment; links remapped to the
# 7-keypoint index space.
DREAM_PANDA = dataclasses.replace(
    FR3,
    name="dream_panda",
    view_base_rotations_zyx_deg={},
    # The franka FLANGE row (passive, d=0.107 after joint 7): DREAM's
    # panda_hand keypoint sits at the flange/hand frame origin, 10.7 cm
    # beyond the link7 origin - without this row the chain has no origin
    # there at all. URDF frame <-> chain-origin assignment (verified against
    # the zero-config URDF origins, test_dream_panda_urdf_origins):
    #   panda_link0->o0, link2->o2, link3->o3, link4->o4, link6->o6,
    #   link7->o7, hand->o8(flange). An earlier mapping used (...,5,6,7),
    #   which put link7 at the link6 origin (8.8 cm off) and hand at the
    #   link7 origin (10.7 cm off) for REAL DREAM data; the synthetic
    #   harness was self-consistent either way (it generates keypoints from
    #   this same spec).
    dh_params=FR3.dh_params + ((0.0, 0.107, 0.0, 0.0),),
    n_passive_rows=1,
    keypoint_fk_indices=(0, 2, 3, 4, 6, 7, 8),
    links=((0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6)),
)

_REGISTRY = {r.name: r for r in (FR3, FR5, MECA500, DREAM_PANDA)}


def get_robot(name: str) -> RobotSpec:
    return _REGISTRY[name]


def _spec_tables(spec: RobotSpec):
    """Static jnp tables for a spec (traced as constants under jit)."""
    p = np.asarray(spec.dh_params, dtype=np.float32)
    a = jnp.asarray(p[:, 0])
    d = jnp.asarray(p[:, 1])
    alpha = jnp.deg2rad(jnp.asarray(p[:, 2]))
    theta_off = jnp.deg2rad(jnp.asarray(p[:, 3]))
    return a, d, alpha, theta_off


def forward_kinematics(
    spec: RobotSpec,
    joint_angles: jnp.ndarray,
    base_rotation: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Joint angles (J,) -> 3D keypoints (J+1, 3) in the robot base frame.

    joint_angles are in the spec's native unit (`spec.angle_unit`); degrees
    are converted internally. `base_rotation` is the optional (3, 3) per-view
    base correction (see RobotSpec.base_rotation).

    Implemented as a `lax.scan` over the DH chain: compiler-friendly static
    control flow, and the whole chain stays on-device. Batch with `jax.vmap`.
    """
    a, d, alpha, theta_off = _spec_tables(spec)
    angles = jnp.asarray(joint_angles, dtype=jnp.float32)
    if spec.angle_unit == "deg":
        angles = jnp.deg2rad(angles)
    if spec.n_passive_rows:
        # Fixed trailing links (e.g. the franka flange): no actuated angle,
        # theta is the row's offset alone.
        angles = jnp.concatenate(
            [angles, jnp.zeros((spec.n_passive_rows,), angles.dtype)], axis=-1
        )
    theta = angles + theta_off

    T0 = jnp.eye(4, dtype=jnp.float32)
    if base_rotation is not None:
        T0 = T0.at[:3, :3].set(jnp.asarray(base_rotation, dtype=jnp.float32))

    builder = standard_dh_matrix if spec.convention == "standard" else modified_dh_matrix

    def step(T, row):
        a_i, d_i, alpha_i, theta_i = row
        T_next = T @ builder(a_i, d_i, alpha_i, theta_i)
        return T_next, T_next[:3, 3]

    rows = (a, d, alpha, theta)
    _, positions = jax.lax.scan(step, T0, rows)
    base = jnp.zeros((1, 3), dtype=jnp.float32)
    return jnp.concatenate([base, positions], axis=0)


def forward_kinematics_frames(
    spec: RobotSpec,
    joint_angles: jnp.ndarray,
    base_rotation: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """FK returning full frames: ((J+1, 3) positions, (J+1, 3, 3) rotations).

    Same scan as forward_kinematics but keeps each link frame's rotation -
    needed wherever joint ORIENTATION matters (e.g. rendering an
    end-effector marker that reveals the wrist roll, whose jacobian onto
    joint-origin positions is exactly zero). Row 0 is the base frame.
    """
    a, d, alpha, theta_off = _spec_tables(spec)
    angles = jnp.asarray(joint_angles, dtype=jnp.float32)
    if spec.angle_unit == "deg":
        angles = jnp.deg2rad(angles)
    if spec.n_passive_rows:
        # Fixed trailing links (e.g. the franka flange): no actuated angle,
        # theta is the row's offset alone.
        angles = jnp.concatenate(
            [angles, jnp.zeros((spec.n_passive_rows,), angles.dtype)], axis=-1
        )
    theta = angles + theta_off

    T0 = jnp.eye(4, dtype=jnp.float32)
    if base_rotation is not None:
        T0 = T0.at[:3, :3].set(jnp.asarray(base_rotation, dtype=jnp.float32))

    builder = standard_dh_matrix if spec.convention == "standard" else modified_dh_matrix

    def step(T, row):
        a_i, d_i, alpha_i, theta_i = row
        T_next = T @ builder(a_i, d_i, alpha_i, theta_i)
        return T_next, T_next

    _, Ts = jax.lax.scan(step, T0, (a, d, alpha, theta))
    Ts = jnp.concatenate([T0[None], Ts], axis=0)  # (J+1, 4, 4)
    return Ts[:, :3, 3], Ts[:, :3, :3]


def forward_kinematics_batch(
    spec: RobotSpec,
    joint_angles: jnp.ndarray,
    base_rotation: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Batched FK: (B, J) -> (B, J+1, 3)."""
    fn = lambda ang: forward_kinematics(spec, ang, base_rotation)
    return jax.vmap(fn)(joint_angles)
