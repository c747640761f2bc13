"""Checkpoint round-trip: full state (params + optimizer + step) restores."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvropose_tpu.models import EstimatorConfig, SingleViewPoseEstimator
from mvropose_tpu.models.vit import VIT_TINY_TEST
from mvropose_tpu.geometry.heatmap import render_heatmaps
from mvropose_tpu.train import TrainConfig, create_train_state, make_single_view_train_step
from mvropose_tpu.train.checkpoint import (
    CheckpointManager,
    CheckpointMeta,
    save_params_npz,
    load_params_npz,
)

TINY = EstimatorConfig(
    vit=VIT_TINY_TEST, num_joints=3, num_angles=2, heatmap_size=(32, 32),
    num_fusion_queries=2, num_angle_queries=2, dtype="float32",
)


def _mk_state_and_step(rng, cfg):
    model = SingleViewPoseEstimator(TINY)
    kps = rng.uniform(4, 28, size=(4, 3, 2)).astype(np.float32)
    batch = {
        "images": jnp.asarray(rng.normal(size=(4, 64, 64, 3)).astype(np.float32)),
        "heatmaps": render_heatmaps(jnp.asarray(kps), 32, 32, sigma=2.0),
        "angles": jnp.asarray(rng.uniform(-1, 1, size=(4, 2)).astype(np.float32)),
    }
    variables = model.init(jax.random.PRNGKey(0), batch["images"][:1])
    state = create_train_state(model, variables, cfg)
    step = make_single_view_train_step(cfg)
    return model, state, step, batch


def test_checkpoint_full_roundtrip(tmp_path, rng):
    cfg = TrainConfig(num_epochs=1, steps_per_epoch=10)
    model, state, step, batch = _mk_state_and_step(rng, cfg)
    for i in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(i))

    mgr = CheckpointManager(tmp_path / "ckpt")
    mgr.save(3, state, CheckpointMeta(epoch=1, best_val_loss=0.25))
    mgr.wait()

    # Fresh state, then restore: EVERYTHING must match (params, opt, step).
    _, fresh, _, _ = _mk_state_and_step(np.random.default_rng(7), cfg)
    restored, meta = mgr.restore(fresh)
    assert int(restored.step) == 3
    assert meta.epoch == 1 and meta.best_val_loss == 0.25
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(restored.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(state.opt_state), jax.tree_util.tree_leaves(restored.opt_state)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Training continues bit-identically from the restored state.
    s1, m1 = step(state, batch, jax.random.PRNGKey(99))
    s2, m2 = step(restored, batch, jax.random.PRNGKey(99))
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), abs=1e-6)
    mgr.close()


def test_restore_none_when_empty(tmp_path, rng):
    cfg = TrainConfig()
    _, state, _, _ = _mk_state_and_step(rng, cfg)
    mgr = CheckpointManager(tmp_path / "empty")
    assert mgr.restore(state) is None
    mgr.close()


def test_params_npz_roundtrip(tmp_path, rng):
    cfg = TrainConfig()
    _, state, _, _ = _mk_state_and_step(rng, cfg)
    path = tmp_path / "best.npz"
    save_params_npz(path, state.params)
    loaded = load_params_npz(path, state.params)
    for a, b in zip(jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_checkpoint_restores_on_mesh(tmp_path, rng):
    """Save from a mesh-sharded training run, restore, continue on the mesh -
    the trainer-elasticity path (reference had none; a dead rank killed the
    job)."""
    from mvropose_tpu.parallel import make_mesh, replicate, shard_batch

    cfg = TrainConfig(num_epochs=1, steps_per_epoch=10)
    model = SingleViewPoseEstimator(TINY)
    kps = rng.uniform(4, 28, size=(8, 3, 2)).astype(np.float32)
    batch = {
        "images": jnp.asarray(rng.normal(size=(8, 64, 64, 3)).astype(np.float32)),
        "heatmaps": render_heatmaps(jnp.asarray(kps), 32, 32, sigma=2.0),
        "angles": jnp.asarray(rng.uniform(-1, 1, size=(8, 2)).astype(np.float32)),
    }
    variables = model.init(jax.random.PRNGKey(0), batch["images"][:1])
    mesh = make_mesh(n_data=8)
    state = create_train_state(model, variables, cfg)
    step = make_single_view_train_step(cfg, mesh)
    with mesh:
        sharded = shard_batch(mesh, batch)
        for i in range(2):
            state, _ = step(state, sharded, jax.random.PRNGKey(i))

        mgr = CheckpointManager(tmp_path / "mesh_ckpt")
        mgr.save(2, state, CheckpointMeta(epoch=1, best_val_loss=1.0))
        mgr.wait()

        # Fresh state (as after a restart), restore, keep training.
        fresh = create_train_state(
            model, model.init(jax.random.PRNGKey(9), batch["images"][:1]), cfg
        )
        restored, meta = mgr.restore(fresh)
        assert int(restored.step) == 2 and meta.epoch == 1
        # Orbax restores device-0-committed arrays; re-replicate on the mesh.
        restored = restored.replace(
            params=replicate(mesh, restored.params),
            batch_stats=replicate(mesh, restored.batch_stats),
            opt_state=replicate(mesh, restored.opt_state),
            step=replicate(mesh, restored.step),
        )
        restored, m = step(restored, sharded, jax.random.PRNGKey(5))
        assert np.isfinite(float(m["loss"]))
        mgr.close()


def test_batch_stats_npz_roundtrip(tmp_path, rng):
    """best_params.npz bundles BatchNorm running stats: inference from a
    params-only file ran BN with whatever the eval template held (zeros =
    rsqrt(0+eps) blow-ups) - the regression that broke cli eval/serve on
    every trained checkpoint."""
    from mvropose_tpu.train.checkpoint import load_batch_stats_npz

    cfg = TrainConfig()
    _, state, step, batch = _mk_state_and_step(rng, cfg)
    # Two real steps so running stats move away from their init values.
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    state, _ = step(state, batch, jax.random.PRNGKey(2))
    assert any(
        float(jnp.abs(x).sum()) > 0
        for x in jax.tree_util.tree_leaves(state.batch_stats)
    )
    path = tmp_path / "best.npz"
    save_params_npz(path, state.params, batch_stats=state.batch_stats)

    template = jax.tree_util.tree_map(lambda x: jnp.zeros_like(x), state.batch_stats)
    loaded, n_loaded, n_total = load_batch_stats_npz(path, template)
    assert n_loaded == n_total
    for a, b in zip(
        jax.tree_util.tree_leaves(state.batch_stats), jax.tree_util.tree_leaves(loaded)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batch_stats_npz_legacy_fallback(tmp_path, rng):
    """Files saved before batch_stats were bundled load with the flax BN
    INIT values (mean 0 / var ONE - never zero var) and n_loaded=0."""
    from mvropose_tpu.train.checkpoint import load_batch_stats_npz

    cfg = TrainConfig()
    _, state, _, _ = _mk_state_and_step(rng, cfg)
    path = tmp_path / "legacy.npz"
    save_params_npz(path, state.params)  # params only, old format

    template = jax.tree_util.tree_map(lambda x: jnp.zeros_like(x), state.batch_stats)
    loaded, n_loaded, n_total = load_batch_stats_npz(path, template)
    assert n_loaded == 0 and n_total > 0
    flat = jax.tree_util.tree_flatten_with_path(loaded)[0]
    assert flat, "model has no batch_stats - test needs a BN-carrying model"
    for keypath, leaf in flat:
        name = str(getattr(keypath[-1], "key", ""))
        expected = 1.0 if name == "var" else 0.0
        np.testing.assert_array_equal(np.asarray(leaf), np.full(leaf.shape, expected))


@pytest.mark.slow
def test_export_params_from_ckpt_script(tmp_path, rng):
    """The re-export script rebuilds best_params.npz (params + batch_stats)
    from an orbax checkpoint without needing the model definition - the
    rescue path for workdirs whose npz predates batch_stats bundling."""
    import subprocess
    import sys
    from pathlib import Path

    cfg = TrainConfig(num_epochs=1, steps_per_epoch=10)
    _, state, step, batch = _mk_state_and_step(rng, cfg)
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    workdir = tmp_path / "wd"
    mgr = CheckpointManager(workdir / "ckpt")
    mgr.save(1, state, CheckpointMeta(epoch=1, best_val_loss=0.5))
    mgr.wait()
    mgr.close()

    repo = Path(__file__).resolve().parents[1]
    out = subprocess.run(
        [sys.executable, str(repo / "scripts" / "export_params_from_ckpt.py"),
         "--workdir", str(workdir)],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    data = np.load(workdir / "best_params.npz")
    assert any(k.startswith("batch_stats/") for k in data.keys())
    # Spot-check one param leaf round-trips exactly.
    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)
        flat[name] = np.asarray(leaf)
    some = sorted(flat)[0]
    np.testing.assert_array_equal(data[some], flat[some])


def test_partial_batch_stats_bundle_is_hard_error(tmp_path, rng):
    """A batch_stats bundle that only PARTIALLY matches the model means the
    file came from a different architecture whose param shapes happened to
    coincide; silently resetting the unmatched BN modules to init stats
    degrades inference with no symptom, so eval/serve must refuse loudly
    (legacy files with NO batch_stats still load with a warning)."""
    from mvropose_tpu.cli.main import _load_variables_checked

    cfg = TrainConfig()
    model, state, step, batch = _mk_state_and_step(rng, cfg)
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    path = tmp_path / "best.npz"
    save_params_npz(path, state.params, batch_stats=state.batch_stats)

    # Drop one batch_stats leaf from the file -> partial bundle.
    data = dict(np.load(path))
    bs_keys = [k for k in data if k.startswith("batch_stats/")]
    assert len(bs_keys) >= 2
    del data[bs_keys[0]]
    partial = tmp_path / "partial.npz"
    np.savez(partial, **data)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    with pytest.raises(SystemExit, match="partially match"):
        _load_variables_checked(str(partial), variables, angle_head="query")

    # The complete file loads fine through the same path.
    out = _load_variables_checked(str(path), variables, angle_head="query")
    for a, b in zip(
        jax.tree_util.tree_leaves(state.batch_stats),
        jax.tree_util.tree_leaves(out["batch_stats"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
