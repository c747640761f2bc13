"""On-device batched image augmentations.

jnp replacements for the reference's torchvision/kornia pipelines
(/root/reference/model/DREAM_Train.py:696-704: ColorJitter, GaussianBlur,
RandomGrayscale, RandomErasing; Fr5_model_train.ipynb cell 12 kornia batch
aug; DREAM_Train.py:627-670 custom RandomMasking rectangles).

All transforms operate on a whole (B, H, W, 3) float batch in [0, 1] BEFORE
normalization, are driven by an explicit PRNG key (reproducible), and jit
into the input pipeline - the kornia "GPU batch augmentation" idea done the
XLA way. Rectangle erasing uses coordinate masks instead of dynamic slicing
(static shapes).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

_LUMA = jnp.asarray([0.299, 0.587, 0.114])


def adjust_brightness(img, factor):
    return img * factor


def adjust_contrast(img, factor):
    mean = jnp.mean(img * _LUMA, axis=(-3, -2, -1), keepdims=True) * 3.0
    return (img - mean) * factor + mean


def adjust_saturation(img, factor):
    gray = jnp.sum(img * _LUMA, axis=-1, keepdims=True)
    return gray + (img - gray) * factor


def adjust_hue(img, delta):
    """Hue rotation via the YIQ approximation (differentiable, no HSV branch).

    img: (..., H, W, 3); delta: broadcastable to (...,) - one scalar per image.
    """
    yiq_from_rgb = jnp.asarray(
        [[0.299, 0.587, 0.114], [0.596, -0.274, -0.322], [0.211, -0.523, 0.312]]
    )
    rgb_from_yiq = jnp.linalg.inv(yiq_from_rgb)
    yiq = img @ yiq_from_rgb.T
    delta = jnp.reshape(jnp.asarray(delta), jnp.shape(img)[:-3] + (1, 1))
    cos, sin = jnp.cos(2 * jnp.pi * delta), jnp.sin(2 * jnp.pi * delta)
    y, i, q = yiq[..., 0], yiq[..., 1], yiq[..., 2]
    i2 = cos * i - sin * q
    q2 = sin * i + cos * q
    return jnp.stack([y, i2, q2], axis=-1) @ rgb_from_yiq.T


def color_jitter(key, img, brightness=0.2, contrast=0.2, saturation=0.2, hue=0.1):
    """Per-image random jitter over a batch (B, H, W, 3) in [0, 1]."""
    B = img.shape[0]
    kb, kc, ks, kh, kp = jax.random.split(key, 5)
    fb = jax.random.uniform(kb, (B, 1, 1, 1), minval=1 - brightness, maxval=1 + brightness)
    fc = jax.random.uniform(kc, (B, 1, 1, 1), minval=1 - contrast, maxval=1 + contrast)
    fs = jax.random.uniform(ks, (B, 1, 1, 1), minval=1 - saturation, maxval=1 + saturation)
    fh = jax.random.uniform(kh, (B,), minval=-hue, maxval=hue)
    img = adjust_brightness(img, fb)
    img = adjust_contrast(img, fc)
    img = adjust_saturation(img, fs)
    img = adjust_hue(img, fh)
    return jnp.clip(img, 0.0, 1.0)


def gaussian_blur(key, img, kernel_size=5, sigma_range=(0.1, 5.0), prob=1.0):
    """Depthwise separable gaussian blur with per-batch random sigma."""
    B = img.shape[0]
    ks_sig, ks_apply = jax.random.split(key)
    sigma = jax.random.uniform(ks_sig, (), minval=sigma_range[0], maxval=sigma_range[1])
    r = kernel_size // 2
    x = jnp.arange(-r, r + 1, dtype=jnp.float32)
    k1d = jnp.exp(-(x**2) / (2 * sigma**2))
    k1d = k1d / jnp.sum(k1d)

    def blur(im):
        # Separable conv along H then W, per channel.
        imT = jnp.moveaxis(im, -1, 0)  # (3, H, W)
        kh = k1d.reshape(1, 1, -1, 1)
        kw = k1d.reshape(1, 1, 1, -1)
        z = imT[:, None]  # (3, 1, H, W)
        z = jax.lax.conv_general_dilated(z, kh, (1, 1), "SAME")
        z = jax.lax.conv_general_dilated(z, kw, (1, 1), "SAME")
        return jnp.moveaxis(z[:, 0], 0, -1)

    blurred = jax.vmap(blur)(img)
    apply = jax.random.uniform(ks_apply, (B, 1, 1, 1)) < prob
    return jnp.where(apply, blurred, img)


def random_grayscale(key, img, prob=0.1):
    B = img.shape[0]
    gray = jnp.sum(img * _LUMA, axis=-1, keepdims=True)
    gray = jnp.broadcast_to(gray, img.shape)
    apply = jax.random.uniform(key, (B, 1, 1, 1)) < prob
    return jnp.where(apply, gray, img)


def _rect_mask(key, B, H, W, scale, ratio):
    """(B, H, W, 1) boolean rectangle masks via coordinate comparison."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = jax.random.uniform(k1, (B,), minval=scale[0], maxval=scale[1]) * H * W
    aspect = jnp.exp(
        jax.random.uniform(k2, (B,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]))
    )
    h = jnp.clip(jnp.sqrt(area * aspect), 1, H - 1)
    w = jnp.clip(jnp.sqrt(area / aspect), 1, W - 1)
    y0 = jax.random.uniform(k3, (B,)) * (H - h)
    x0 = jax.random.uniform(k4, (B,)) * (W - w)
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    inside = (
        (ys >= y0[:, None, None]) & (ys < (y0 + h)[:, None, None])
        & (xs >= x0[:, None, None]) & (xs < (x0 + w)[:, None, None])
    )
    return inside[..., None]


def random_erasing(key, img, prob=0.2, scale=(0.1, 0.2), ratio=(0.3, 2.0)):
    """torchvision RandomErasing: rectangle filled with random noise."""
    B, H, W, _ = img.shape
    km, kf, ka = jax.random.split(key, 3)
    mask = _rect_mask(km, B, H, W, scale, ratio)
    fill = jax.random.uniform(kf, img.shape)
    apply = jax.random.uniform(ka, (B, 1, 1, 1)) < prob
    return jnp.where(mask & apply, fill, img)


def random_masking(key, img, num_masks=1, mask_size_ratio=(0.1, 0.3)):
    """The reference's occlusion-robustness masking: solid random-color
    rectangles (DREAM_Train.py:627-670)."""
    B, H, W, _ = img.shape
    out = img
    for i in range(num_masks):
        km, kc, key = jax.random.split(key, 3)
        mask = _rect_mask(
            km, B, H, W,
            (mask_size_ratio[0] ** 2, mask_size_ratio[1] ** 2),
            (0.5, 2.0),
        )
        color = jax.random.uniform(kc, (B, 1, 1, 3))
        out = jnp.where(mask, color, out)
    return out


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    brightness: float = 0.2
    contrast: float = 0.2
    saturation: float = 0.2
    hue: float = 0.1
    blur_prob: float = 0.5
    blur_kernel: int = 5
    grayscale_prob: float = 0.1
    erasing_prob: float = 0.2
    masking_num: int = 0  # reference uses masking only as a robustness probe


@functools.partial(jax.jit, static_argnames=("cfg",))
def augment_batch(key: jax.Array, img: jnp.ndarray, cfg: AugmentConfig = AugmentConfig()):
    """Full train-time pipeline on a [0, 1] float batch (B, H, W, 3)."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    img = color_jitter(k1, img, cfg.brightness, cfg.contrast, cfg.saturation, cfg.hue)
    img = gaussian_blur(k2, img, cfg.blur_kernel, prob=cfg.blur_prob)
    img = random_grayscale(k3, img, cfg.grayscale_prob)
    img = random_erasing(k4, img, cfg.erasing_prob)
    if cfg.masking_num > 0:
        img = random_masking(k5, img, cfg.masking_num)
    return img
