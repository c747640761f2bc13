"""Device augmentation pipeline properties."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvropose_tpu.data.augment import (
    AugmentConfig,
    augment_batch,
    color_jitter,
    gaussian_blur,
    random_grayscale,
    random_erasing,
    random_masking,
    adjust_hue,
)


@pytest.fixture
def imgs(rng):
    return jnp.asarray(rng.uniform(0, 1, size=(4, 32, 48, 3)).astype(np.float32))


def test_color_jitter_bounds_and_determinism(imgs):
    out1 = color_jitter(jax.random.PRNGKey(0), imgs)
    out2 = color_jitter(jax.random.PRNGKey(0), imgs)
    out3 = color_jitter(jax.random.PRNGKey(1), imgs)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert float(jnp.abs(out1 - out3).max()) > 0  # different key, different aug
    assert float(out1.min()) >= 0 and float(out1.max()) <= 1


def test_hue_identity_at_zero(imgs):
    out = adjust_hue(imgs, jnp.zeros((4, 1, 1)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-5)


def test_gaussian_blur_smooths(imgs):
    out = gaussian_blur(jax.random.PRNGKey(0), imgs, prob=1.0, sigma_range=(3.0, 3.0))
    tv_in = float(jnp.abs(jnp.diff(imgs, axis=2)).mean())
    tv_out = float(jnp.abs(jnp.diff(out, axis=2)).mean())
    assert tv_out < tv_in * 0.7


def test_random_grayscale_channels_equal(imgs):
    out = random_grayscale(jax.random.PRNGKey(3), imgs, prob=1.0)
    np.testing.assert_allclose(np.asarray(out[..., 0]), np.asarray(out[..., 1]), atol=1e-6)


def test_random_erasing_changes_rectangle_only(imgs):
    out = random_erasing(jax.random.PRNGKey(1), imgs, prob=1.0, scale=(0.05, 0.1))
    diff = np.asarray(jnp.any(jnp.abs(out - imgs) > 1e-9, axis=-1))  # (B, H, W)
    frac = diff.mean(axis=(1, 2))
    assert (frac > 0.01).all() and (frac < 0.35).all()


def test_random_masking_solid_color(imgs):
    out = random_masking(jax.random.PRNGKey(2), imgs, num_masks=1, mask_size_ratio=(0.3, 0.4))
    changed = np.asarray(jnp.any(jnp.abs(out - imgs) > 1e-9, axis=-1))
    assert changed.any()
    # Masked pixels share one color per image.
    for b in range(imgs.shape[0]):
        px = np.asarray(out[b])[changed[b]]
        if len(px):
            assert np.allclose(px, px[0], atol=1e-6)


def test_augment_batch_jits(imgs):
    out = augment_batch(jax.random.PRNGKey(0), imgs, AugmentConfig(masking_num=1))
    assert out.shape == imgs.shape
    assert np.isfinite(np.asarray(out)).all()
