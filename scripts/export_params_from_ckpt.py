"""Re-export best_params.npz (params + batch_stats) from an orbax checkpoint.

For training workdirs whose best_params.npz predates batch_stats bundling
(the BatchNorm running stats the stem/UNet head need at inference), this
rebuilds the npz from the full orbax train state - no template model needed:
StandardRestore without a reference tree returns the raw pytree.

Usage:
    python scripts/export_params_from_ckpt.py --workdir runs/dream_synth \
        [--step 3162] [--out runs/dream_synth/best_params.npz]
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", required=True, help="training workdir (contains ckpt/)")
    p.add_argument("--step", type=int, default=None, help="checkpoint step (default: latest)")
    p.add_argument("--out", default=None, help="output npz (default: <workdir>/best_params.npz)")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import orbax.checkpoint as ocp

    from mvropose_tpu.train.checkpoint import save_params_npz

    ckpt_dir = Path(args.workdir).absolute() / "ckpt"
    mgr = ocp.CheckpointManager(ckpt_dir)
    step = args.step if args.step is not None else mgr.latest_step()
    if step is None:
        print(f"no checkpoints under {ckpt_dir}", file=sys.stderr)
        return 1
    payload = mgr.restore(step, args=ocp.args.StandardRestore())
    out = Path(args.out) if args.out else Path(args.workdir) / "best_params.npz"
    save_params_npz(out, payload["params"], batch_stats=payload.get("batch_stats"))
    meta = payload.get("meta", {})
    print(f"exported step {step} (epoch {meta.get('epoch')}) -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
