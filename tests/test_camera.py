"""Camera model vs OpenCV golden behaviour."""

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvropose_tpu.geometry import camera as cam


K = np.array([[737.118, 0, 974.584], [0, 737.085, 612.68], [0, 0, 1]], dtype=np.float64)
DIST = np.array([-0.0056431, -0.0461363, 0.0001342, 0.0003112, 0.0147880], dtype=np.float64)


def test_project_points_matches_cv2(rng):
    pts = rng.uniform(-0.5, 0.5, size=(20, 3))
    pts[:, 2] += 1.5  # in front of camera
    rvec = np.array([0.1, -0.2, 0.3])
    tvec = np.array([0.05, -0.1, 0.8])
    want, _ = cv2.projectPoints(pts, rvec, tvec, K, DIST)
    want = want.reshape(-1, 2)
    got = np.asarray(
        cam.project_points(
            jnp.asarray(pts, jnp.float32),
            jnp.asarray(rvec, jnp.float32),
            jnp.asarray(tvec, jnp.float32),
            jnp.asarray(K, jnp.float32),
            jnp.asarray(DIST, jnp.float32),
        )
    )
    np.testing.assert_allclose(got, want, atol=0.1)  # float32 vs float64, ~0.1px


def test_project_points_no_distortion(rng):
    pts = rng.uniform(-0.5, 0.5, size=(10, 3))
    pts[:, 2] += 2.0
    rvec = np.zeros(3)
    tvec = np.zeros(3)
    want, _ = cv2.projectPoints(pts, rvec, tvec, K, np.zeros(5))
    got = np.asarray(
        cam.project_points(
            jnp.asarray(pts, jnp.float32),
            jnp.asarray(rvec, jnp.float32),
            jnp.asarray(tvec, jnp.float32),
            jnp.asarray(K, jnp.float32),
            None,
        )
    )
    np.testing.assert_allclose(got, want.reshape(-1, 2), atol=0.05)


def test_undistort_points_inverts_distortion(rng):
    ideal = rng.uniform([200, 200], [1700, 1000], size=(30, 2))
    # Distort the ideal pixels with the forward model...
    x = (ideal[:, 0] - K[0, 2]) / K[0, 0]
    y = (ideal[:, 1] - K[1, 2]) / K[1, 1]
    xy = np.stack([x, y], axis=-1)
    xyd = np.asarray(cam.distort_normalized(jnp.asarray(xy), jnp.asarray(DIST)))
    distorted = np.stack(
        [K[0, 0] * xyd[:, 0] + K[0, 2], K[1, 1] * xyd[:, 1] + K[1, 2]], axis=-1
    )
    # ...then undo it.
    got = np.asarray(
        cam.undistort_points(
            jnp.asarray(distorted, jnp.float32),
            jnp.asarray(K, jnp.float32),
            jnp.asarray(DIST, jnp.float32),
        )
    )
    np.testing.assert_allclose(got, ideal, atol=0.05)


def test_undistort_image_matches_cv2():
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 255, size=(120, 160, 3))).astype(np.float32)
    # Smooth the image so bilinear-sampling differences stay small.
    img = cv2.GaussianBlur(img, (15, 15), 5)
    Ks = K.copy()
    Ks[:2] *= 160 / 1920.0  # scale intrinsics to the small test image
    want = cv2.undistort(img, Ks, DIST)
    got = np.asarray(
        cam.undistort_image(
            jnp.asarray(img), jnp.asarray(Ks, jnp.float32), jnp.asarray(DIST, jnp.float32)
        )
    )
    # Compare the central region (border handling differs at the edge).
    w = np.abs(want[10:-10, 10:-10] - got[10:-10, 10:-10])
    assert np.median(w) < 0.5
    assert np.mean(w) < 1.0


def test_remap_precompute_equivalence():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, size=(64, 80, 3)).astype(np.float32)
    Ks = K.copy()
    Ks[:2] *= 80 / 1920.0
    remap = cam.undistort_map(jnp.asarray(Ks, jnp.float32), jnp.asarray(DIST, jnp.float32), 64, 80)
    out1 = np.asarray(cam.remap_bilinear(jnp.asarray(img), remap))
    out2 = np.asarray(
        cam.undistort_image(jnp.asarray(img), jnp.asarray(Ks, jnp.float32), jnp.asarray(DIST, jnp.float32))
    )
    np.testing.assert_allclose(out1, out2, atol=1e-6)


def test_project_points_differentiable():
    def loss(rvec):
        p = cam.project_points(
            jnp.ones((4, 3)), rvec, jnp.asarray([0.0, 0.0, 2.0]), jnp.asarray(K, jnp.float32), None
        )
        return jnp.sum(p**2)

    g = jax.grad(loss)(jnp.asarray([0.1, 0.2, 0.3], jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))


def test_project_points_behind_camera_finite():
    """Points behind the camera produce finite (if meaningless) pixels - the
    serve path must never NaN-poison downstream PnP weights."""
    pts = jnp.asarray([[0.0, 0.0, -1.0], [0.1, 0.1, -2.0]], jnp.float32)
    out = np.asarray(
        cam.project_points(pts, jnp.zeros(3), jnp.zeros(3), jnp.asarray(K, jnp.float32), None)
    )
    assert np.isfinite(out).all()


def test_undistort_map_zero_distortion_identity():
    remap = cam.undistort_map(jnp.asarray(K, jnp.float32), jnp.zeros(5), 32, 40)
    grid_y, grid_x = np.meshgrid(np.arange(32), np.arange(40), indexing="ij")
    np.testing.assert_allclose(np.asarray(remap[0]), grid_y, atol=1e-3)
    np.testing.assert_allclose(np.asarray(remap[1]), grid_x, atol=1e-3)
