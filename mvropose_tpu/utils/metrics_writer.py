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
        import numpy as np

        rec = {"step": int(step), "time": time.time()}
        # Scalars become floats; small vectors (e.g. per-joint MAE) stay as
        # JSON lists - including numpy/jax arrays, which are neither list
        # nor tuple (float(ndarray) raises for any length > 1).
        def _jsonable(v):
            if isinstance(v, (list, tuple)):
                return [float(x) for x in v]
            if np.ndim(v) > 0:
                return np.asarray(v, dtype=np.float64).reshape(-1).tolist()
            return float(v)

        rec.update({k: _jsonable(v) for k, v in metrics.items()})
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

            # cv2.imwrite signals failure by RETURNING False (bad path,
            # full disk) - without the check the artifact silently
            # disappears and the .npy fallback never runs.
            if not cv2.imwrite(str(path), np.asarray(image)[:, :, ::-1]):
                raise IOError(f"cv2.imwrite failed for {path}")
        except Exception:
            np.save(str(path.with_suffix(".npy")), np.asarray(image))
        if self._wandb is not None:
            self._wandb.log({name: self._wandb.Image(np.asarray(image))}, step=step)

    def close(self) -> None:
        self._file.close()
        if self._wandb is not None:
            self._wandb.finish()
