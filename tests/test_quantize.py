"""int8 backbone quantization (models/quantize.py): numerical parity with
the float backbone and structural round-trip of the converted param tree."""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mvropose_tpu.models.quantize import (
    int8_matmul,
    quantize_backbone_params,
    _quantize_kernel,
)
from mvropose_tpu.models.vit import ViTBackbone, ViTConfig


CFG = ViTConfig(
    image_size=64, patch_size=16, hidden_size=64, num_layers=2, num_heads=4,
    layerscale_init=1e-5, dtype="float32",
)


def test_int8_matmul_matches_float_within_quant_noise():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 32)).astype(np.float32)
    w = rng.standard_normal((32, 16)).astype(np.float32)
    b = rng.standard_normal((16,)).astype(np.float32)
    kq, scale = _quantize_kernel(w, in_dims=1)
    got = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(kq), jnp.asarray(scale),
                                 jnp.asarray(b), jnp.float32))
    want = x @ w + b
    # Two symmetric 8-bit roundings: ~1% relative error on the matmul scale.
    denom = np.abs(x @ w).max()
    assert np.abs(got - want).max() / denom < 0.02


@pytest.mark.parametrize("use_rope", [False, True])
def test_quantized_backbone_tracks_float_backbone(use_rope):
    cfg = dataclasses.replace(CFG, use_rope=use_rope)
    model = ViTBackbone(cfg)
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), imgs)["params"]
    ref = model.apply({"params": params}, imgs)["patch_tokens"]

    qcfg = dataclasses.replace(cfg, quant="int8")
    qmodel = ViTBackbone(qcfg)
    qparams = quantize_backbone_params(params)

    # Structural check: the converted tree has exactly the shapes the quant
    # model expects (init the quant model and compare shape/dtype trees).
    init_q = qmodel.init(jax.random.PRNGKey(0), imgs)["params"]
    want_shapes = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), init_q)
    got_shapes = jax.tree_util.tree_map(
        lambda a: (a.shape, jnp.asarray(a).dtype), qparams
    )
    assert want_shapes == got_shapes

    got = qmodel.apply({"params": jax.tree_util.tree_map(jnp.asarray, qparams)}, imgs)[
        "patch_tokens"
    ]
    ref = np.asarray(ref)
    got = np.asarray(got)
    # Per-token cosine similarity: quantization noise must not rotate the
    # features (heads consume directions, LayerNorm kills magnitude).
    cos = (ref * got).sum(-1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1) + 1e-9
    )
    assert cos.min() > 0.995, cos.min()
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.15, rel
