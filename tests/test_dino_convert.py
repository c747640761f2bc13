"""DINO weight conversion: numerical parity against an independent numpy ViT.

A timm-style random state dict is built for the tiny config, run through an
independent numpy implementation of the standard pre-norm ViT forward, and
the converted Flax backbone must reproduce its patch tokens.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvropose_tpu.models.vit import ViTBackbone, ViTConfig
from mvropose_tpu.models.dino_convert import convert_dino_state_dict

CFG = ViTConfig(
    image_size=32, patch_size=8, hidden_size=32, num_layers=2, num_heads=4,
    num_register_tokens=2, layerscale_init=1e-5, dtype="float32",
)


def make_timm_state_dict(rng, cfg):
    D = cfg.hidden_size
    p = cfg.patch_size
    N = cfg.num_patches
    sd = {
        "cls_token": rng.normal(size=(1, 1, D)) * 0.02,
        "reg_token": rng.normal(size=(1, cfg.num_register_tokens, D)) * 0.02,
        "pos_embed": rng.normal(size=(1, N + 1, D)) * 0.02,
        "patch_embed.proj.weight": rng.normal(size=(D, 3, p, p)) * 0.05,
        "patch_embed.proj.bias": rng.normal(size=(D,)) * 0.02,
        "norm.weight": rng.uniform(0.5, 1.5, size=(D,)),
        "norm.bias": rng.normal(size=(D,)) * 0.02,
    }
    for i in range(cfg.num_layers):
        pre = f"blocks.{i}."
        sd[pre + "norm1.weight"] = rng.uniform(0.5, 1.5, size=(D,))
        sd[pre + "norm1.bias"] = rng.normal(size=(D,)) * 0.02
        sd[pre + "norm2.weight"] = rng.uniform(0.5, 1.5, size=(D,))
        sd[pre + "norm2.bias"] = rng.normal(size=(D,)) * 0.02
        sd[pre + "attn.qkv.weight"] = rng.normal(size=(3 * D, D)) * 0.05
        sd[pre + "attn.qkv.bias"] = rng.normal(size=(3 * D,)) * 0.02
        sd[pre + "attn.proj.weight"] = rng.normal(size=(D, D)) * 0.05
        sd[pre + "attn.proj.bias"] = rng.normal(size=(D,)) * 0.02
        sd[pre + "ls1.gamma"] = rng.uniform(0.9, 1.1, size=(D,)) * 1e-1
        sd[pre + "ls2.gamma"] = rng.uniform(0.9, 1.1, size=(D,)) * 1e-1
        sd[pre + "mlp.fc1.weight"] = rng.normal(size=(4 * D, D)) * 0.05
        sd[pre + "mlp.fc1.bias"] = rng.normal(size=(4 * D,)) * 0.02
        sd[pre + "mlp.fc2.weight"] = rng.normal(size=(D, 4 * D)) * 0.05
        sd[pre + "mlp.fc2.bias"] = rng.normal(size=(D,)) * 0.02
    return sd


def np_layernorm(x, w, b, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def np_gelu(x):
    from scipy.stats import norm

    return x * norm.cdf(x)


def np_vit_forward(sd, cfg, images):
    """Independent numpy pre-norm ViT with LayerScale (timm semantics)."""
    B = images.shape[0]
    D, p, H = cfg.hidden_size, cfg.patch_size, cfg.num_heads
    Dh = D // H
    g = cfg.image_size // p

    # Patch embed: conv stride p == per-patch linear on (p, p, 3) blocks.
    W = sd["patch_embed.proj.weight"]  # (D, 3, p, p)
    Wl = W.reshape(D, -1)  # flatten (3, p, p)
    patches = images.reshape(B, g, p, g, p, 3).transpose(0, 1, 3, 5, 2, 4)  # (B,g,g,3,p,p)
    patches = patches.reshape(B, g * g, 3 * p * p)
    x = patches @ Wl.T + sd["patch_embed.proj.bias"]  # (B, N, D)

    x = x + sd["pos_embed"][:, 1:]
    cls = sd["cls_token"] + sd["pos_embed"][:, :1]
    cls = np.broadcast_to(cls, (B, 1, D))
    reg = np.broadcast_to(sd["reg_token"], (B, cfg.num_register_tokens, D))
    x = np.concatenate([cls, reg, x], axis=1)

    for i in range(cfg.num_layers):
        pre = f"blocks.{i}."
        h = np_layernorm(x, sd[pre + "norm1.weight"], sd[pre + "norm1.bias"])
        qkv = h @ sd[pre + "attn.qkv.weight"].T + sd[pre + "attn.qkv.bias"]
        q, k, v = np.split(qkv, 3, axis=-1)
        T = x.shape[1]

        def heads(z):
            return z.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        att = q @ k.transpose(0, 1, 3, 2) / np.sqrt(Dh)
        att = np.exp(att - att.max(-1, keepdims=True))
        att = att / att.sum(-1, keepdims=True)
        o = (att @ v).transpose(0, 2, 1, 3).reshape(B, T, D)
        o = o @ sd[pre + "attn.proj.weight"].T + sd[pre + "attn.proj.bias"]
        x = x + o * sd[pre + "ls1.gamma"]

        h = np_layernorm(x, sd[pre + "norm2.weight"], sd[pre + "norm2.bias"])
        h = np_gelu(h @ sd[pre + "mlp.fc1.weight"].T + sd[pre + "mlp.fc1.bias"])
        h = h @ sd[pre + "mlp.fc2.weight"].T + sd[pre + "mlp.fc2.bias"]
        x = x + h * sd[pre + "ls2.gamma"]

    x = np_layernorm(x, sd["norm.weight"], sd["norm.bias"])
    return x  # (B, 1+R+N, D)


def test_converted_backbone_matches_numpy_reference(rng):
    sd = make_timm_state_dict(rng, CFG)
    params = convert_dino_state_dict(sd, CFG.num_layers, CFG.num_heads, CFG.hidden_size)

    images = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    want = np_vit_forward(sd, CFG, images.astype(np.float64))

    model = ViTBackbone(CFG)
    out = model.apply({"params": params}, jnp.asarray(images))
    got_cls = np.asarray(out["cls_token"])
    got_reg = np.asarray(out["register_tokens"])
    got_patch = np.asarray(out["patch_tokens"])

    np.testing.assert_allclose(got_cls, want[:, 0], atol=2e-4)
    np.testing.assert_allclose(got_reg, want[:, 1:3], atol=2e-4)
    np.testing.assert_allclose(got_patch, want[:, 3:], atol=2e-4)


def test_converted_shapes_match_flax_init(rng):
    """Converted tree has exactly the structure flax init produces."""
    sd = make_timm_state_dict(rng, CFG)
    params = convert_dino_state_dict(sd, CFG.num_layers, CFG.num_heads, CFG.hidden_size)
    model = ViTBackbone(CFG)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]

    flat_c = jax.tree_util.tree_leaves_with_path(params)
    flat_i = jax.tree_util.tree_leaves_with_path(init)
    paths_c = {jax.tree_util.keystr(p): v.shape for p, v in flat_c}
    paths_i = {jax.tree_util.keystr(p): v.shape for p, v in flat_i}
    assert paths_c == paths_i


def test_hf_naming_accepted(rng):
    """HF-style separate q/k/v names convert identically to timm qkv."""
    sd = make_timm_state_dict(rng, CFG)
    hf = {}
    for k, v in sd.items():
        if ".attn.qkv." in k:
            pre, kind = k.split("attn.qkv.")
            q, kk, vv = np.split(v, 3, axis=0)
            hf[pre + "attention.attention.query." + kind] = q
            hf[pre + "attention.attention.key." + kind] = kk
            hf[pre + "attention.attention.value." + kind] = vv
        elif ".attn.proj." in k:
            hf[k.replace("attn.proj.", "attention.output.dense.")] = v
        elif ".ls1.gamma" in k:
            hf[k.replace("ls1.gamma", "layer_scale1.lambda1")] = v
        elif ".ls2.gamma" in k:
            hf[k.replace("ls2.gamma", "layer_scale2.lambda1")] = v
        else:
            hf[k] = v
    p1 = convert_dino_state_dict(sd, CFG.num_layers, CFG.num_heads, CFG.hidden_size)
    p2 = convert_dino_state_dict(hf, CFG.num_layers, CFG.num_heads, CFG.hidden_size)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# Real-torch parity: instantiate actual HF transformers DINO modules (random
# init - no hub egress), convert their state dicts, and assert activation
# parity against ViTBackbone. This validates the conversion against the real
# modules the reference trains on (DREAM_Train.py:137, MvRoPose_FR3.py:334),
# not just a synthetic naming scheme.
# ---------------------------------------------------------------------------

def _hf_dinov2_config(registers: bool, image_size: int = 28):
    from transformers import Dinov2Config, Dinov2WithRegistersConfig

    kw = dict(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=256, image_size=image_size, patch_size=14,
        layerscale_value=1.0, hidden_act="gelu",
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
    )
    if registers:
        return Dinov2WithRegistersConfig(num_register_tokens=4, **kw)
    return Dinov2Config(**kw)


def _vit_config_for(hf_cfg, registers: bool):
    return ViTConfig(
        image_size=hf_cfg.image_size, patch_size=hf_cfg.patch_size,
        hidden_size=hf_cfg.hidden_size, num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads, layerscale_init=1e-5,
        num_register_tokens=4 if registers else 0, dtype="float32",
    )


def _run_hf_parity(registers: bool, run_size: int | None = None):
    import torch
    from transformers import Dinov2Model, Dinov2WithRegistersModel

    torch.manual_seed(0)
    hf_cfg = _hf_dinov2_config(registers)
    model_t = (Dinov2WithRegistersModel if registers else Dinov2Model)(hf_cfg).eval()

    size = run_size or hf_cfg.image_size
    rng = np.random.default_rng(1)
    images = rng.normal(size=(2, size, size, 3)).astype(np.float32)
    with torch.no_grad():
        want = model_t(
            torch.from_numpy(images.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()

    sd = {k: v.numpy() for k, v in model_t.state_dict().items()}
    params = convert_dino_state_dict(
        sd, hf_cfg.num_hidden_layers, hf_cfg.num_attention_heads, hf_cfg.hidden_size
    )
    cfg = _vit_config_for(hf_cfg, registers)
    out = ViTBackbone(cfg).apply({"params": params}, jnp.asarray(images))

    n_prefix = 1 + cfg.num_register_tokens
    np.testing.assert_allclose(np.asarray(out["cls_token"]), want[:, 0], atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["patch_tokens"]), want[:, n_prefix:], atol=1e-4
    )
    if registers:
        np.testing.assert_allclose(
            np.asarray(out["register_tokens"]), want[:, 1:n_prefix], atol=1e-4
        )


def test_real_hf_dinov2_activation_parity():
    """Converted real HF Dinov2Model reproduces patch-token activations."""
    _run_hf_parity(registers=False)


def test_real_hf_dinov2_with_registers_parity():
    """DINOv3-style variant: register tokens between CLS and patches."""
    _run_hf_parity(registers=True)


def test_real_hf_dinov2_interpolated_pos_embed_parity():
    """Run at a different resolution than the checkpoint grid: the 518->512
    pos-embed interpolation case. Requires the torch-exact bicubic
    (a=-0.75, antialias) pos-embed resize."""
    _run_hf_parity(registers=False, run_size=56)  # grid 2 -> 4 (upsample)
    _run_hf_parity(registers=False, run_size=42)  # grid 2 -> 3 (non-integer)


@pytest.mark.parametrize("antialias", [False, True])
def test_torch_bicubic_matrix_matches_torch(antialias):
    """The trace-time resize matrix reproduces F.interpolate bicubic
    (align_corners=False) in both antialias modes, on up-, down- and
    non-integer scales (incl. the DINO 37->32 grid case)."""
    import torch

    from mvropose_tpu.models.vit import _torch_bicubic_matrix

    rng = np.random.default_rng(0)
    for n_in, n_out in [(2, 3), (4, 9), (37, 32), (16, 7)]:
        x = rng.normal(size=(1, 5, n_in, n_in)).astype(np.float32)
        want = torch.nn.functional.interpolate(
            torch.from_numpy(x), size=(n_out, n_out), mode="bicubic",
            align_corners=False, antialias=antialias,
        ).numpy()
        M = _torch_bicubic_matrix(n_in, n_out, antialias).astype(np.float32)
        got = np.einsum("Hh,bchw->bcHw", M, x)
        got = np.einsum("Ww,bchw->bchW", M, got)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_real_hf_dinov3_rope_activation_parity():
    """Real HF DINOv3ViTModel (RoPE attention, separate q/k/v/o projections,
    biasless k, NO pos-embed parameter) converts and reproduces activations
    through ViTBackbone(use_rope=True) - at the native grid AND at a larger
    one (RoPE recomputes per grid; nothing to interpolate). This is the
    actual facebook/dinov3-* architecture the reference loads
    (MvRoPose_FR3.py:326-353), not the v2-with-registers stand-in."""
    import torch
    from transformers.models.dinov3_vit import DINOv3ViTConfig, DINOv3ViTModel

    torch.manual_seed(0)
    hf_cfg = DINOv3ViTConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=256, image_size=32, patch_size=16,
        num_register_tokens=2, hidden_act="gelu", attention_dropout=0.0,
        drop_path_rate=0.0, layerscale_value=1.0,
    )
    model_t = DINOv3ViTModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in model_t.state_dict().items()}
    from mvropose_tpu.models.dino_convert import is_dinov3_state_dict

    assert is_dinov3_state_dict(sd)
    params = convert_dino_state_dict(
        sd, hf_cfg.num_hidden_layers, hf_cfg.num_attention_heads, hf_cfg.hidden_size
    )
    assert "pos_embed" not in params  # RoPE model has no absolute embedding
    cfg = ViTConfig(
        image_size=hf_cfg.image_size, patch_size=hf_cfg.patch_size,
        hidden_size=hf_cfg.hidden_size, num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        num_register_tokens=hf_cfg.num_register_tokens,
        layerscale_init=1.0, dtype="float32",
        use_rope=True, rope_theta=hf_cfg.rope_theta,
        layer_norm_eps=hf_cfg.layer_norm_eps,  # DINOv3 uses 1e-5, not 1e-6
    )
    rng = np.random.default_rng(3)
    for size in (32, 64):  # native 2x2 grid, then 4x4 (rope recomputed)
        images = rng.normal(size=(2, size, size, 3)).astype(np.float32)
        with torch.no_grad():
            want = model_t(
                torch.from_numpy(images.transpose(0, 3, 1, 2))
            ).last_hidden_state.numpy()
        out = ViTBackbone(cfg).apply({"params": params}, jnp.asarray(images))
        n_prefix = 1 + cfg.num_register_tokens
        np.testing.assert_allclose(
            np.asarray(out["cls_token"]), want[:, 0], atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out["register_tokens"]), want[:, 1:n_prefix], atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out["patch_tokens"]), want[:, n_prefix:], atol=1e-4
        )


def test_dinov3_gated_mlp_rejected():
    """7B-scale gated-MLP checkpoints fail loudly, not with a KeyError."""
    from mvropose_tpu.models.dino_convert import convert_dinov3_state_dict

    sd = {
        "layer.0.attention.q_proj.weight": np.zeros((8, 8), np.float32),
        "layer.0.mlp.gate_proj.weight": np.zeros((16, 8), np.float32),
    }
    with pytest.raises(NotImplementedError, match="gated"):
        convert_dinov3_state_dict(sd, 1, 1, 8)
