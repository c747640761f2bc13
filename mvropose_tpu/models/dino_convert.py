"""DINO checkpoint conversion: torch state dicts -> Flax ViTBackbone params.

The reference consumes pretrained DINOv2 via timm
(/root/reference/model/DREAM_Train.py:133-142) and DINOv3 via HF transformers
(/root/reference/model/MvRoPose_FR3.py:326-353). This converter maps either
naming scheme onto our ViTBackbone parameter tree so trained reference-side
backbones can be reused for numerical parity runs.

Input is a {name: np.ndarray} mapping (load a .pth with torch on host, or an
exported .npz - this environment has no model-hub egress, so conversion is
exercised on synthetic state dicts with the real naming/shapes).

timm naming (vit_base_patch14_dinov2 family):
  cls_token (1,1,D) | reg_token (1,R,D) | pos_embed (1,1+N,D)
  patch_embed.proj.{weight (D,3,p,p), bias}
  blocks.{i}.norm1.{weight,bias}
  blocks.{i}.attn.qkv.{weight (3D,D), bias (3D,)}
  blocks.{i}.attn.proj.{weight (D,D), bias}
  blocks.{i}.ls1.gamma / ls2.gamma
  blocks.{i}.mlp.fc1.{weight (4D,D), bias} / fc2.{weight (D,4D), bias}
  norm.{weight,bias}
HF DINOv2 names are normalized onto the same slots via _hf_to_timm_key; real
HF DINOv3 checkpoints (RoPE attention, q_proj/o_proj naming, no pos_embed)
take the separate convert_dinov3_state_dict path and require
ViTConfig(use_rope=True).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear weight (out, in) -> flax Dense kernel (in, out)."""
    return np.ascontiguousarray(w.T)


def _hf_to_timm_key(name: str) -> str:
    """Normalize HF dinov2/v3 parameter names to the timm-style scheme."""
    n = name
    n = n.replace("embeddings.cls_token", "cls_token")
    n = n.replace("embeddings.register_tokens", "reg_token")
    n = n.replace("embeddings.mask_token", "mask_token")
    n = n.replace("embeddings.position_embeddings", "pos_embed")
    n = n.replace("embeddings.patch_embeddings.projection", "patch_embed.proj")
    n = n.replace("embeddings.patch_embeddings.weight", "patch_embed.proj.weight")
    n = n.replace("encoder.layer.", "blocks.")
    n = n.replace("layer.", "blocks.") if n.startswith("layer.") else n
    n = n.replace("norm1", "norm1").replace("norm2", "norm2")
    n = n.replace("attention.attention.query", "attn.q")
    n = n.replace("attention.attention.key", "attn.k")
    n = n.replace("attention.attention.value", "attn.v")
    n = n.replace("attention.output.dense", "attn.proj")
    n = n.replace("layer_scale1.lambda1", "ls1.gamma")
    n = n.replace("layer_scale2.lambda1", "ls2.gamma")
    n = n.replace("mlp.fc1", "mlp.fc1").replace("mlp.fc2", "mlp.fc2")
    n = n.replace("layernorm.", "norm.")
    return n


def is_dinov3_state_dict(sd: Mapping[str, np.ndarray]) -> bool:
    """Real HF DINOv3 ViTs (facebook/dinov3-*) use RoPE attention with
    separate q/k/v/o projections and NO position-embedding parameter."""
    return any(".attention.q_proj." in k or ".attention.o_proj." in k for k in sd)


def convert_dinov3_state_dict(
    sd: Mapping[str, np.ndarray],
    num_layers: int,
    num_heads: int,
    hidden_size: int,
) -> dict:
    """HF DINOv3ViTModel state dict -> params for ViTBackbone(use_rope=True).

    Mapping (see transformers dinov3_vit.modeling_dinov3_vit):
      embeddings.{cls_token, register_tokens, patch_embeddings.*}
      layer.{i}.{norm1, norm2, attention.{q,k,v,o}_proj,
                 layer_scale{1,2}.lambda1, mlp.{up,down}_proj}
      norm
    k_proj has NO bias in DINOv3 (config.key_bias=False) - written as zeros
    (bias=0 is the identical computation). mask_token is ignored (inference
    never masks patches). Gated-MLP (7B-scale) checkpoints are rejected.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    if any(".mlp.gate_proj." in k for k in sd):
        raise NotImplementedError(
            "gated-MLP DINOv3 checkpoints (ViT-7B scale) are not supported; "
            "the reference uses vitb16/vitl16 (standard MLP)"
        )
    D, H = hidden_size, num_heads
    Dh = D // H

    params: dict = {}
    params["cls_token"] = sd["embeddings.cls_token"].reshape(1, 1, D)
    if "embeddings.register_tokens" in sd:
        params["register_tokens"] = sd["embeddings.register_tokens"].reshape(1, -1, D)
    w = sd["embeddings.patch_embeddings.weight"]  # (D, 3, p, p)
    params["patch_embed"] = {
        "kernel": np.transpose(w, (2, 3, 1, 0)),  # (p, p, 3, D) NHWC conv
        "bias": sd["embeddings.patch_embeddings.bias"],
    }
    for i in range(num_layers):
        pre = f"layer.{i}."
        blk: dict = {
            "norm1": {"scale": sd[pre + "norm1.weight"], "bias": sd[pre + "norm1.bias"]},
            "norm2": {"scale": sd[pre + "norm2.weight"], "bias": sd[pre + "norm2.bias"]},
        }
        att = {}
        for ours, theirs in (("query", "q_proj"), ("key", "k_proj"), ("value", "v_proj")):
            att[ours] = {
                "kernel": _t(sd[pre + f"attention.{theirs}.weight"]).reshape(D, H, Dh),
                "bias": sd.get(
                    pre + f"attention.{theirs}.bias", np.zeros(D, np.float32)
                ).reshape(H, Dh),
            }
        att["out"] = {
            "kernel": _t(sd[pre + "attention.o_proj.weight"]).reshape(H, Dh, D),
            "bias": sd[pre + "attention.o_proj.bias"],
        }
        blk["attn"] = att
        blk["ls1"] = {"gamma": sd[pre + "layer_scale1.lambda1"].reshape(-1)}
        blk["ls2"] = {"gamma": sd[pre + "layer_scale2.lambda1"].reshape(-1)}
        blk["mlp"] = {
            "fc1": {
                "kernel": _t(sd[pre + "mlp.up_proj.weight"]),
                "bias": sd[pre + "mlp.up_proj.bias"],
            },
            "fc2": {
                "kernel": _t(sd[pre + "mlp.down_proj.weight"]),
                "bias": sd[pre + "mlp.down_proj.bias"],
            },
        }
        params[f"block_{i}"] = blk
    params["norm"] = {"scale": sd["norm.weight"], "bias": sd["norm.bias"]}
    return params


def convert_dino_state_dict(
    sd: Mapping[str, np.ndarray],
    num_layers: int,
    num_heads: int,
    hidden_size: int,
) -> dict:
    """-> params dict for ViTBackbone (plug into {'params': {'backbone': ...}}
    or apply directly to a bare ViTBackbone). Dispatches on the naming
    scheme: timm / HF-DINOv2 absolute-pos-embed checkpoints map here; real
    HF DINOv3 (RoPE, q_proj/o_proj naming) maps via
    convert_dinov3_state_dict - pair those with ViTConfig(use_rope=True)."""
    if is_dinov3_state_dict(sd):
        return convert_dinov3_state_dict(sd, num_layers, num_heads, hidden_size)
    sd = {_hf_to_timm_key(k): np.asarray(v) for k, v in sd.items()}
    D = hidden_size
    H = num_heads
    Dh = D // H

    params: dict = {}
    params["cls_token"] = sd["cls_token"].reshape(1, 1, D)
    params["pos_embed"] = sd["pos_embed"].reshape(1, -1, D)
    if "reg_token" in sd:
        params["register_tokens"] = sd["reg_token"].reshape(1, -1, D)

    w = sd["patch_embed.proj.weight"]  # (D, 3, p, p)
    params["patch_embed"] = {
        "kernel": np.transpose(w, (2, 3, 1, 0)),  # (p, p, 3, D) for NHWC conv
        "bias": sd["patch_embed.proj.bias"],
    }

    for i in range(num_layers):
        pre = f"blocks.{i}."
        blk: dict = {}
        blk["norm1"] = {"scale": sd[pre + "norm1.weight"], "bias": sd[pre + "norm1.bias"]}
        blk["norm2"] = {"scale": sd[pre + "norm2.weight"], "bias": sd[pre + "norm2.bias"]}

        if pre + "attn.qkv.weight" in sd:
            qkv_w = sd[pre + "attn.qkv.weight"]  # (3D, D)
            qkv_b = sd.get(pre + "attn.qkv.bias", np.zeros(3 * D))
            q_w, k_w, v_w = np.split(qkv_w, 3, axis=0)
            q_b, k_b, v_b = np.split(qkv_b, 3, axis=0)
        else:  # HF separate q/k/v
            q_w, k_w, v_w = (sd[pre + f"attn.{c}.weight"] for c in "qkv")
            q_b, k_b, v_b = (
                sd.get(pre + f"attn.{c}.bias", np.zeros(D)) for c in "qkv"
            )
        blk["attn"] = {
            "query": {"kernel": _t(q_w).reshape(D, H, Dh), "bias": q_b.reshape(H, Dh)},
            "key": {"kernel": _t(k_w).reshape(D, H, Dh), "bias": k_b.reshape(H, Dh)},
            "value": {"kernel": _t(v_w).reshape(D, H, Dh), "bias": v_b.reshape(H, Dh)},
            "out": {
                "kernel": _t(sd[pre + "attn.proj.weight"]).reshape(H, Dh, D),
                "bias": sd[pre + "attn.proj.bias"],
            },
        }
        if pre + "ls1.gamma" in sd:
            blk["ls1"] = {"gamma": sd[pre + "ls1.gamma"].reshape(-1)}
            blk["ls2"] = {"gamma": sd[pre + "ls2.gamma"].reshape(-1)}
        blk["mlp"] = {
            "fc1": {"kernel": _t(sd[pre + "mlp.fc1.weight"]), "bias": sd[pre + "mlp.fc1.bias"]},
            "fc2": {"kernel": _t(sd[pre + "mlp.fc2.weight"]), "bias": sd[pre + "mlp.fc2.bias"]},
        }
        params[f"block_{i}"] = blk

    params["norm"] = {"scale": sd["norm.weight"], "bias": sd["norm.bias"]}
    return params


def load_torch_checkpoint(path: str) -> dict:
    """Load a .pth/.pt state dict to numpy (torch is CPU-only here)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}
