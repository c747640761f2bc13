"""Pure-jnp differentiable geometry core.

Everything here is a pure function of jnp arrays: vmappable, jittable and
differentiable. This is the foundation every other layer tests against.
"""

from mvropose_tpu.geometry.rotations import (
    rodrigues_to_matrix,
    matrix_to_rodrigues,
    quat_to_matrix,
    matrix_to_quat,
    euler_zyx_deg_to_matrix,
    average_quaternion,
    quat_angular_distance,
)
from mvropose_tpu.geometry.dh import standard_dh_matrix, modified_dh_matrix
from mvropose_tpu.geometry.robots import (
    RobotSpec,
    FR3,
    FR5,
    MECA500,
    DREAM_PANDA,
    get_robot,
    forward_kinematics,
)
from mvropose_tpu.geometry.camera import (
    distort_normalized,
    project_points,
    undistort_points,
    undistort_map,
    remap_bilinear,
    undistort_image,
)
from mvropose_tpu.geometry.heatmap import (
    render_heatmaps,
    argmax_decode,
    soft_argmax_decode,
)
from mvropose_tpu.geometry.pnp import (
    solve_pnp,
    solve_pnp_dlt,
    solve_pnp_planar,
    refine_pnp_lm,
    solve_pnp_ransac,
)
from mvropose_tpu.geometry.triangulation import triangulate_dlt
from mvropose_tpu.geometry.ik import fk_jacobian, solve_ik

__all__ = [
    "rodrigues_to_matrix",
    "matrix_to_rodrigues",
    "quat_to_matrix",
    "matrix_to_quat",
    "euler_zyx_deg_to_matrix",
    "average_quaternion",
    "quat_angular_distance",
    "standard_dh_matrix",
    "modified_dh_matrix",
    "RobotSpec",
    "FR3",
    "FR5",
    "MECA500",
    "DREAM_PANDA",
    "get_robot",
    "forward_kinematics",
    "distort_normalized",
    "project_points",
    "undistort_points",
    "undistort_map",
    "remap_bilinear",
    "undistort_image",
    "render_heatmaps",
    "argmax_decode",
    "soft_argmax_decode",
    "solve_pnp",
    "solve_pnp_dlt",
    "solve_pnp_planar",
    "refine_pnp_lm",
    "solve_pnp_ransac",
    "triangulate_dlt",
    "fk_jacobian",
    "solve_ik",
]
