"""Heatmap render/decode vs the reference numpy formulas."""

import numpy as np

import jax.numpy as jnp

from mvropose_tpu.geometry import heatmap as hm


def np_gt_heatmap(kp, size, sigma):
    """Independent numpy reimplementation of the reference GT formula."""
    H, W = size
    x, y = kp
    xx, yy = np.meshgrid(np.arange(W), np.arange(H))
    d2 = (xx - x) ** 2 + (yy - y) ** 2
    h = np.exp(-d2 / (2 * sigma**2))
    h[h < np.finfo(float).eps * h.max()] = 0
    return h


def test_render_matches_reference_formula(rng):
    kps = rng.uniform(5, 120, size=(8, 2)).astype(np.float32)
    got = np.asarray(hm.render_heatmaps(jnp.asarray(kps), 128, 128, sigma=5.0))
    assert got.shape == (8, 128, 128)
    for j in range(8):
        want = np_gt_heatmap(kps[j], (128, 128), 5.0)
        np.testing.assert_allclose(got[j], want, atol=1e-5)


def test_render_batched(rng):
    kps = rng.uniform(0, 64, size=(4, 7, 2)).astype(np.float32)
    got = np.asarray(hm.render_heatmaps(jnp.asarray(kps), 64, 64, sigma=3.0))
    assert got.shape == (4, 7, 64, 64)
    want = np_gt_heatmap(kps[2, 3], (64, 64), 3.0)
    np.testing.assert_allclose(got[2, 3], want, atol=1e-5)


def test_argmax_decode_roundtrip(rng):
    """decode(render(kp)) == round(kp): the reference's implicit invariant."""
    kps = rng.uniform(10, 110, size=(6, 2)).astype(np.float32)
    maps = hm.render_heatmaps(jnp.asarray(kps), 128, 128, sigma=4.0)
    xy, score = hm.argmax_decode(maps, apply_sigmoid=False)
    # Exact parity with the numpy argmax/unravel_index decode.
    maps_np = np.asarray(maps)
    for j in range(6):
        y, x = np.unravel_index(np.argmax(maps_np[j]), (128, 128))
        np.testing.assert_allclose(np.asarray(xy)[j], [x, y])
        np.testing.assert_allclose(float(score[j]), maps_np[j].max())
    # And the argmax of a rendered gaussian is the rounded keypoint.
    np.testing.assert_allclose(np.asarray(xy), kps, atol=0.51)


def test_soft_argmax_subpixel(rng):
    kps = rng.uniform(20, 100, size=(5, 2)).astype(np.float32)
    maps = hm.render_heatmaps(jnp.asarray(kps), 128, 128, sigma=4.0)
    xy, _ = hm.soft_argmax_decode(maps * 30.0, apply_sigmoid=False)
    # Soft-argmax on a sharpened gaussian recovers sub-pixel positions.
    np.testing.assert_allclose(np.asarray(xy), kps, atol=0.2)


def test_decode_sigmoid_confidence():
    maps = jnp.zeros((1, 32, 32)).at[0, 10, 20].set(4.0)
    xy, score = hm.argmax_decode(maps)
    assert np.allclose(np.asarray(xy), [[20, 10]])
    assert abs(float(score[0]) - 1 / (1 + np.exp(-4.0))) < 1e-5


def test_scale_keypoints():
    kp = jnp.asarray([[64.0, 32.0]])
    out = np.asarray(hm.scale_keypoints(kp, (128, 128), (720, 1280)))
    np.testing.assert_allclose(out, [[64 * 10.0, 32 * 720 / 128]])


def test_peak_refine_decode_subpixel(rng):
    """Peak-windowed refinement recovers subpixel positions on LOGIT maps
    (background far below zero), where full-map soft-argmax is biased toward
    the image center by the background's softmax mass."""
    kps = rng.uniform(20, 100, size=(5, 2)).astype(np.float32)
    maps = hm.render_heatmaps(jnp.asarray(kps), 128, 128, sigma=2.0)
    logits = maps * 6.0 - 3.0  # peak ~ +3, background ~ -3
    xy_ref, conf = hm.peak_refine_decode(logits, apply_sigmoid=False)
    np.testing.assert_allclose(np.asarray(xy_ref), kps, atol=0.25)
    # conf matches the hard-argmax peak value semantics.
    np.testing.assert_allclose(np.asarray(conf), np.asarray(logits).max((-2, -1)), atol=1e-5)
    xy_soft, _ = hm.soft_argmax_decode(logits, apply_sigmoid=False)
    err_soft = np.linalg.norm(np.asarray(xy_soft) - kps, axis=-1)
    err_ref = np.linalg.norm(np.asarray(xy_ref) - kps, axis=-1)
    assert err_ref.max() < err_soft.min()  # refinement beats full-map soft everywhere
