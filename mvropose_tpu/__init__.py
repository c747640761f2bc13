"""MvRoPose-TPU: a TPU-native multi-view robot pose estimation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the ICRA 2025
"Multi-View Robot Pose Estimation" reference pipeline (markerless multi-camera
robot arm pose estimation from synchronized RGB streams).

Layering (bottom-up):
  geometry/  pure-jnp differentiable kinematics, camera models, heatmaps, PnP
  calib/     ZED .conf parsing, ArUco extrinsic averaging, rig registry
  data/      timestamp sync engine, multi-view grouping, fixed-shape loaders
  models/    Flax ViT backbone + CNN stem + UNet keypoint head + query angle
             head + latent-query multi-view fusion
  ops/       Pallas TPU kernels (fused peak decode, heatmap render)
  decode/    heatmap -> keypoint decoding (Pallas fast path + jnp parity path)
  train/     train state, losses, metrics (PCK/ADD), sharded train loop
  parallel/  mesh construction and sharding rules
  pose/      serve path: decode -> PnP/triangulation -> 6D pose
  rig/       camera source abstraction + streaming batched inference
  cli/       sync / calibrate / train / eval / serve subcommands
"""

__version__ = "0.1.0"
