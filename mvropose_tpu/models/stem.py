"""Light CNN stem: multi-scale spatial features for the UNet keypoint head.

Equivalent of the reference LightCNNStem
(/root/reference/model/DREAM_Train.py:225-251): three stride-2 convs giving
1/4 (32ch) and 1/8 (64ch) feature maps. NHWC, BatchNorm with running stats
carried in the `batch_stats` collection.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn


class ConvBNGelu(nn.Module):
    features: int
    strides: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            kernel_size=(3, 3),
            strides=(self.strides, self.strides),
            padding=1,
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        return nn.gelu(x.astype(self.dtype), approximate=False)


class LightCNNStem(nn.Module):
    """images (B, H, W, 3) -> (feat_4 (B, H/4, W/4, 32), feat_8 (B, H/8, W/8, 64))."""

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNGelu(16, strides=2, dtype=self.dtype, name="conv1")(x.astype(self.dtype), train)
        feat_4 = ConvBNGelu(32, strides=2, dtype=self.dtype, name="conv2")(x, train)
        feat_8 = ConvBNGelu(64, strides=2, dtype=self.dtype, name="conv3")(feat_4, train)
        return feat_4, feat_8
