"""Build a DINO-format backbone checkpoint for the frozen-regime run.

The reference's actual training configuration is a frozen *pretrained*
DINOv2/v3 backbone with heads-only optimization
(/root/reference/model/DREAM_Train.py:133-142 requires_grad=False,
MvRoPose_FR3.py:326-353). No pretrained weights exist offline in this
environment (zero egress), so the frozen-regime evidence run uses a real
torch `transformers.Dinov2Model` at the synthetic-harness scale, randomly
initialized, saved in HF naming - which exercises the full
`models.dino_convert` path (torch state dict -> timm-normalized keys ->
Flax tree) inside a training run, exactly as a user with real DINO weights
would.

Usage:
  python scripts/make_frozen_backbone_ckpt.py --out runs/frozen_backbone/dino_192x4.npz
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="runs/frozen_backbone/dino_192x4.npz")
    p.add_argument("--hidden-size", type=int, default=192)
    p.add_argument("--num-layers", type=int, default=4)
    p.add_argument("--num-heads", type=int, default=4)
    p.add_argument("--patch-size", type=int, default=16)
    p.add_argument("--image-size", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import torch
    from transformers import Dinov2Config, Dinov2Model

    torch.manual_seed(args.seed)
    cfg = Dinov2Config(
        hidden_size=args.hidden_size,
        num_hidden_layers=args.num_layers,
        num_attention_heads=args.num_heads,
        intermediate_size=4 * args.hidden_size,
        image_size=args.image_size,
        patch_size=args.patch_size,
        layerscale_value=1.0,
        hidden_act="gelu",
        attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0,
    )
    model = Dinov2Model(cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez(out, **sd)
    n = sum(v.size for v in sd.values())
    print(f"wrote {out} ({len(sd)} tensors, {n/1e6:.2f}M params, HF Dinov2 naming)")


if __name__ == "__main__":
    main()
