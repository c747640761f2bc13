"""Pallas kernels (interpret mode on CPU) vs jnp reference implementations."""

import numpy as np

import jax.numpy as jnp

from mvropose_tpu.geometry.heatmap import render_heatmaps, argmax_decode, soft_argmax_decode
from mvropose_tpu.ops.peak_decode import fused_peak_decode
from mvropose_tpu.ops.heatmap_render import render_heatmaps_pallas
from mvropose_tpu.decode import decode_keypoints


def test_fused_peak_decode_matches_reference(rng):
    kps = rng.uniform(5, 120, size=(3, 7, 2)).astype(np.float32)
    maps = render_heatmaps(jnp.asarray(kps), 128, 128, sigma=4.0)
    maps = maps * 3.0 - 1.0  # arbitrary logits scale

    out = fused_peak_decode(maps, temperature=2.0)
    xy_ref, conf_ref = argmax_decode(maps)
    soft_ref, _ = soft_argmax_decode(maps, temperature=2.0)

    np.testing.assert_allclose(np.asarray(out["argmax_xy"]), np.asarray(xy_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["confidence"]), np.asarray(conf_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["soft_xy"]), np.asarray(soft_ref), atol=1e-3)


def test_fused_peak_decode_nonmultiple_block(rng):
    maps = jnp.asarray(rng.normal(size=(5, 32, 32)).astype(np.float32))
    out = fused_peak_decode(maps, block_m=8)
    xy_ref, conf_ref = argmax_decode(maps)
    np.testing.assert_allclose(np.asarray(out["argmax_xy"]), np.asarray(xy_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["confidence"]), np.asarray(conf_ref), atol=1e-5)


def test_render_pallas_matches_reference(rng):
    kps = rng.uniform(0, 127, size=(2, 8, 2)).astype(np.float32)
    want = np.asarray(render_heatmaps(jnp.asarray(kps), 128, 128, sigma=5.0))
    got = np.asarray(render_heatmaps_pallas(jnp.asarray(kps), 128, 128, sigma=5.0))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_render_per_map_sigma(rng):
    """Non-scalar sigma is per-MAP: a (J,) sigma must broadcast against the
    lead dims, not the trailing width axis (raw broadcasting would silently
    align (J,) with W whenever J == W). jnp and Pallas paths agree."""
    J = 3
    kps = rng.uniform(10, 110, size=(2, J, 2)).astype(np.float32)
    sig = np.array([2.0, 4.0, 6.0], np.float32)
    want = np.stack([
        np.asarray(render_heatmaps(jnp.asarray(kps[:, j]), 128, 128, sigma=float(sig[j])))
        for j in range(J)
    ], axis=1)
    got_jnp = np.asarray(render_heatmaps(jnp.asarray(kps), 128, 128, sigma=jnp.asarray(sig)))
    got_pal = np.asarray(
        render_heatmaps_pallas(jnp.asarray(kps), 128, 128, sigma=jnp.asarray(sig))
    )
    np.testing.assert_allclose(got_jnp, want, atol=1e-6)
    np.testing.assert_allclose(got_pal, want, atol=1e-6)


def test_decode_keypoints_rescale(rng):
    kps = rng.uniform(10, 110, size=(2, 2)).astype(np.float32)
    maps = render_heatmaps(jnp.asarray(kps), 128, 128, sigma=3.0)
    xy, conf = decode_keypoints(maps, image_hw=(720, 1280))
    expect_x = np.round(kps[:, 0]) * (1280 / 128)
    expect_y = np.round(kps[:, 1]) * (720 / 128)
    np.testing.assert_allclose(np.asarray(xy[:, 0]), expect_x, atol=1e-4)
    np.testing.assert_allclose(np.asarray(xy[:, 1]), expect_y, atol=1e-4)
    # Pallas and jnp paths agree.
    xy2, conf2 = decode_keypoints(maps, image_hw=(720, 1280), use_pallas=False)
    np.testing.assert_allclose(np.asarray(xy), np.asarray(xy2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(conf), np.asarray(conf2), atol=1e-5)


def test_reference_decode_golden_parity():
    """Repo decoder == numpy transcription of the reference's
    extract_keypoints_from_heatmaps (Fr5_model_train.ipynb cell 14) on the
    committed fixtures - the BASELINE.md parity table, asserted in CI."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from reference_decode_golden import FIXTURE_PATH, make_fixtures, reference_decode

    fixtures = (
        {k: v for k, v in np.load(FIXTURE_PATH).items()}
        if FIXTURE_PATH.exists()
        else make_fixtures()
    )
    image_hw = (1080, 1920)
    for name, hm in fixtures.items():
        ref_kp, ref_sc = reference_decode(hm, image_hw)
        xy, conf = decode_keypoints(
            jnp.asarray(hm), image_hw=image_hw, mode="argmax", use_pallas=False
        )
        np.testing.assert_array_equal(np.asarray(xy), ref_kp, err_msg=name)
        np.testing.assert_allclose(np.asarray(conf), ref_sc, atol=1e-6, err_msg=name)
