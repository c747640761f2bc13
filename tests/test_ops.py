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


def test_int8_prob_attention_parity(rng):
    """int8-probability attention vs exact softmax attention: the probs
    quantize per row at 127 levels against the ROW MAX, so even rows with
    tiny uniform probabilities (the fixed-scale failure mode) keep full
    relative resolution. Output tolerance covers the two roundings (probs
    <= 0.5/127 of rowmax, v <= 0.5/127 per channel)."""
    import jax

    from mvropose_tpu.ops.attention import fused_self_attention, int8_prob_attention

    B, T, H, d = 2, 65, 4, 32
    q = jnp.asarray(rng.standard_normal((B, T, H, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, H, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, H, d)), jnp.float32)
    exact = np.asarray(fused_self_attention(q, k, v, use_flash=False))
    q8 = np.asarray(int8_prob_attention(q, k, v))
    # Relative-to-output-scale error: bounded by the quantization steps.
    denom = np.abs(exact).max()
    assert np.abs(q8 - exact).max() / denom < 0.05
    assert np.abs(q8 - exact).mean() / denom < 0.005

    # Near-uniform attention rows (q ~ 0 -> logits ~ equal): per-row scaling
    # must not collapse 1/T probabilities to zero.
    q0 = jnp.zeros_like(q) * 1e-3
    exact_u = np.asarray(fused_self_attention(q0, k, v, use_flash=False))
    q8_u = np.asarray(int8_prob_attention(q0, k, v))
    assert np.abs(q8_u - exact_u).max() / (np.abs(exact_u).max() + 1e-9) < 0.05

    # key_mask parity: masked keys contribute nothing in either path.
    mask = jnp.asarray(rng.uniform(size=(B, T)) > 0.3)
    exact_m = np.asarray(fused_self_attention(q, k, v, use_flash=False, key_mask=mask))
    q8_m = np.asarray(int8_prob_attention(q, k, v, key_mask=mask))
    assert np.abs(q8_m - exact_m).max() / np.abs(exact_m).max() < 0.05


def test_fused_layernorm_matches_flax(rng):
    """Pallas fused LN (interpret mode on CPU) vs flax nn.LayerNorm, and the
    residual variant vs add-then-LN."""
    import flax.linen as nn

    from mvropose_tpu.ops.layernorm import fused_layernorm, fused_residual_layernorm

    B, T, D = 2, 37, 256  # rows not a block multiple; D a lane multiple
    x = jnp.asarray(rng.standard_normal((B, T, D)) * 3 + 0.5, jnp.float32)
    h = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (D,)), jnp.float32)
    bias = jnp.asarray(rng.uniform(-0.2, 0.2, (D,)), jnp.float32)

    ln = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)
    want = ln.apply({"params": {"scale": scale, "bias": bias}}, x)
    got = fused_layernorm(x, scale, bias, eps=1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)

    want_res = ln.apply({"params": {"scale": scale, "bias": bias}}, x + h)
    xnew, y = fused_residual_layernorm(x, h, scale, bias, eps=1e-6)
    np.testing.assert_allclose(np.asarray(xnew), np.asarray(x + h), atol=1e-6)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want_res), atol=2e-5, rtol=2e-5)

    # bf16 in/out (the serve configuration): same result at bf16 tolerance.
    got16 = fused_layernorm(x.astype(jnp.bfloat16), scale, bias, eps=1e-6)
    assert got16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got16, np.float32), np.asarray(want), atol=0.05, rtol=0.05
    )


def test_vit_fused_ln_backbone_parity(rng):
    """fused_ln=True runs the SAME param tree as the flax-LN backbone (the
    FusedLayerNorm module owns identical scale/bias leaves) and matches its
    tokens to bf16 tolerance."""
    import dataclasses

    import jax

    from mvropose_tpu.models.vit import ViTBackbone, ViTConfig

    cfg = ViTConfig(
        image_size=32, patch_size=16, hidden_size=128, num_layers=2,
        num_heads=2, dtype="float32",
    )
    model = ViTBackbone(cfg)
    imgs = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs)
    out = model.apply(variables, imgs)

    model_f = ViTBackbone(dataclasses.replace(cfg, fused_ln=True))
    vf = model_f.init(jax.random.PRNGKey(0), imgs)
    assert jax.tree_util.tree_structure(vf) == jax.tree_util.tree_structure(variables)
    out_f = model_f.apply(variables, imgs)  # SAME params
    np.testing.assert_allclose(
        np.asarray(out_f["patch_tokens"]), np.asarray(out["patch_tokens"]),
        atol=1e-4, rtol=1e-4,
    )
