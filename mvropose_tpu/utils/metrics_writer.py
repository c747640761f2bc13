"""Metric writer: JSONL always, wandb/TensorBoard when available.

Replaces the reference's rank-0 wandb logging
(/root/reference/model/DREAM_Train.py:799-847) with a backend-agnostic
writer. JSONL is the source of truth (greppable, survives offline runs -
this build environment has zero egress); wandb attaches opportunistically.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Mapping


class MetricWriter:
    def __init__(self, log_dir: str | Path, use_wandb: bool = False, wandb_kwargs: Mapping | None = None):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._file = open(self.log_dir / "metrics.jsonl", "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(**(dict(wandb_kwargs or {})))
            except Exception:
                self._wandb = None

    def write(self, step: int, metrics: Mapping[str, float]) -> None:
        rec = {"step": int(step), "time": time.time()}
        # Scalars become floats; small vectors (e.g. per-joint MAE) stay as
        # JSON lists.
        rec.update({
            k: [float(x) for x in v] if isinstance(v, (list, tuple)) else float(v)
            for k, v in metrics.items()
        })
        self._file.write(json.dumps(rec) + "\n")
        self._file.flush()
        if self._wandb is not None:
            self._wandb.log(dict(metrics), step=step)

    def write_image(self, step: int, name: str, image) -> None:
        """Save an image artifact (numpy HWC uint8) under the log dir."""
        import numpy as np

        out = self.log_dir / "images"
        out.mkdir(exist_ok=True)
        path = out / f"{name}_step{step}.png"
        try:
            import cv2

            cv2.imwrite(str(path), np.asarray(image)[:, :, ::-1])
        except Exception:
            np.save(str(path.with_suffix(".npy")), np.asarray(image))
        if self._wandb is not None:
            self._wandb.log({name: self._wandb.Image(np.asarray(image))}, step=step)

    def close(self) -> None:
        self._file.close()
        if self._wandb is not None:
            self._wandb.finish()
