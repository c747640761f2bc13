"""Worker for test_distributed.py: one process of a 2-process CPU cluster.

Run: python distributed_worker.py <pid> <nproc> <port> <workdir>

Each process owns 2 fake CPU devices (4 global), joins the cluster via
jax.distributed.initialize, then:
  * runs ONE mesh-sharded single-view train step on a deterministic global
    batch assembled from process-local shards,
  * shards a grain loader by process and records which sample indices it saw,
  * saves an orbax checkpoint (collective across processes) and restores it.
Writes <workdir>/result_<pid>.json for the test harness to cross-check.
"""

import json
import os
import sys
from pathlib import Path

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def _barrier(name: str) -> None:
    """Coordination-service barrier (plain gRPC, no Gloo).

    XLA's CPU Gloo backend initializes a cross-process context at collective
    EXECUTION with a hardcoded 30 s key-exchange window (gloo_kv_store.cc).
    On a timeshared single-core host the workers drift minutes apart across
    compiles and I/O, so each phase that executes a new collective program
    (train step, orbax save, orbax restore) is fronted by one of these."""
    from jax._src import distributed

    if distributed.global_state.client is not None:
        distributed.global_state.client.wait_at_barrier(name, timeout_in_ms=600_000)


def main() -> None:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, workdir = sys.argv[3], Path(sys.argv[4])

    from mvropose_tpu.parallel import initialize_distributed, make_mesh

    initialize_distributed(
        coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc
    assert jax.local_device_count() == 2
    assert jax.device_count() == 2 * nproc

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mvropose_tpu.geometry.heatmap import render_heatmaps
    from mvropose_tpu.models import EstimatorConfig, SingleViewPoseEstimator
    from mvropose_tpu.models.vit import ViTConfig
    from mvropose_tpu.train import (
        TrainConfig,
        create_train_state,
        make_single_view_train_step,
    )
    from mvropose_tpu.train.checkpoint import CheckpointManager, CheckpointMeta

    cfg = EstimatorConfig(
        vit=ViTConfig(image_size=32, patch_size=16, hidden_size=32, num_layers=1,
                      num_heads=2, layerscale_init=None, dtype="float32"),
        num_joints=4, num_angles=6, heatmap_size=(16, 16), max_views=2,
        num_fusion_queries=2, num_angle_queries=2, dtype="float32",
        freeze_backbone=False,
    )
    model = SingleViewPoseEstimator(cfg)

    # Deterministic global batch, identical in every process; each process
    # contributes only ITS addressable rows via make_array_from_process_local_data.
    B = 8
    rng = np.random.default_rng(0)
    g_images = rng.normal(size=(B, 32, 32, 3)).astype(np.float32)
    g_kp = rng.uniform(2, 14, size=(B, 4, 2)).astype(np.float32)
    g_hm = np.asarray(render_heatmaps(jnp.asarray(g_kp), 16, 16, sigma=1.5))
    g_ang = rng.normal(size=(B, 6)).astype(np.float32)

    mesh = make_mesh()  # all 4 global devices on the data axis
    sh = NamedSharding(mesh, P("data"))
    rows = slice(pid * (B // nproc), (pid + 1) * (B // nproc))

    def globalize(host_global):
        return jax.make_array_from_process_local_data(sh, host_global[rows])

    batch = {
        "images": globalize(g_images),
        "heatmaps": globalize(g_hm),
        "angles": globalize(g_ang),
    }

    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    tcfg = TrainConfig(num_epochs=1, steps_per_epoch=4, freeze_backbone=False)
    state = create_train_state(model, variables, tcfg)
    step = make_single_view_train_step(tcfg, mesh)
    with mesh:
        # AOT-compile first, then meet at a coordination-service barrier
        # (plain gRPC to the coordinator - no Gloo) before the first
        # EXECUTION: Gloo's cross-process context initializes at first
        # collective execution with a fixed 30 s key-exchange window, and
        # on a timeshared single-core host compile-time skew between the
        # workers (one hits the persistent compile cache, the other
        # compiles for minutes) blows that window. Compiling apart and
        # executing together makes the skew milliseconds.
        compiled = step.lower(state, batch, jax.random.PRNGKey(1)).compile()
        _barrier("train_step_compiled")
        state, metrics = compiled(state, batch, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])  # fully-replicated output scalar

    # Grain loader sharded by process: record the sample indices this
    # process's shard draws (the DistributedSampler equivalent; harness
    # asserts the two processes' index sets are disjoint and complete).
    from mvropose_tpu.calib.registry import CameraCalib, CameraExtrinsic, RigSpec
    from mvropose_tpu.data.dataset import SingleViewDataset, SingleViewSample
    from mvropose_tpu.data.grain_loader import make_grain_loader
    from mvropose_tpu.geometry.robots import get_robot

    K = np.array([[40.0, 0, 16.0], [0, 40.0, 16.0], [0, 0, 1.0]])
    rig = RigSpec(
        name="dist_test", robot=get_robot("meca500"),
        serial_to_view={"1": "front"},
        calibs={"front_leftcam": CameraCalib(K, np.zeros(5))},
        extrinsics={"front_leftcam": CameraExtrinsic(np.array([1.9, 1.9, -0.6]),
                                                     np.array([0.0, 0.0, 1.0]))},
        heatmap_size=(16, 16),
    )
    n_samples = 12
    samples = [
        SingleViewSample(
            image_path=str(workdir / f"img_{i:02d}.jpg"), camera_key="front_leftcam",
            view="front", angles=np.full(6, float(i), np.float32),
        )
        for i in range(n_samples)
    ]
    ds = SingleViewDataset(samples, rig, image_hw=(32, 32))
    loader = make_grain_loader(
        ds, batch_size=2, shard_index=pid, shard_count=nproc, num_epochs=1
    )
    # angles[0] encodes the sample index (i) - recover which rows we saw.
    seen = sorted(
        int(a) for b in loader for a in np.asarray(b["angles"])[:, 0]
    )

    # Orbax checkpoint: collective save across both processes, then restore.
    _barrier("pre_checkpoint")
    ckpt = CheckpointManager(workdir / "ckpt")
    ckpt.save(int(state.step), state, CheckpointMeta(epoch=1, best_val_loss=loss))
    ckpt.wait()
    fresh = create_train_state(model, variables, tcfg)
    _barrier("pre_restore")
    restored, meta = ckpt.restore(fresh)
    ckpt.close()
    assert int(restored.step) == 1
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    r0 = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(r0), np.asarray(p0), atol=1e-7)

    (workdir / f"result_{pid}.json").write_text(json.dumps({
        "pid": pid,
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "loss": loss,
        "grain_indices": seen,
        "restored_step": int(restored.step),
        "restored_best_val_loss": meta.best_val_loss,
    }))
    print(f"worker {pid} ok loss={loss}")


if __name__ == "__main__":
    main()
