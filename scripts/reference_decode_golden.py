"""Reference-decode golden: numpy transcription of the reference's heatmap
-> keypoint decode, run head-to-head against the repo decoder on committed
fixtures.

The reference's decode lives in `extract_keypoints_from_heatmaps`
(/root/reference/model/Fr5_model_train.ipynb cell 14, lines 1372-1403 of the
flattened source; the realtime copy is /root/reference/DIP_REAL.py:108-131):

    heatmaps = heatmaps.sigmoid()
    for each joint:  max over the flat map -> unravel_index -> (y, x)
                     score = sigmoid-peak value
    scaled_x = x * (original_w / w); scaled_y = y * (original_h / h)

`reference_decode` below is a literal numpy transcription of that loop.
`main` renders deterministic fixtures (clean + noisy + multi-modal heatmaps),
saves them to tests/fixtures/decode_fixtures.npz, and prints a per-fixture
parity table (keypoints + confidences, reference vs repo jnp vs repo Pallas
path) that BASELINE.md records. tests/test_ops.py asserts the same parity in
CI, so the baseline cannot rot silently.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_PATH = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "decode_fixtures.npz"


def reference_decode(heatmaps: np.ndarray, original_image_size) -> tuple:
    """Literal numpy transcription of extract_keypoints_from_heatmaps.

    heatmaps: (J, h, w) raw logits. Returns (keypoints (J, 2) xy in image px,
    scores (J,) sigmoid-peak confidences).
    """
    num_joints, h, w = heatmaps.shape
    original_h, original_w = original_image_size
    keypoints = np.zeros((num_joints, 2), dtype=np.float32)
    scores = np.zeros(num_joints, dtype=np.float32)
    hm = 1.0 / (1.0 + np.exp(-heatmaps.astype(np.float64)))  # sigmoid
    for i in range(num_joints):
        flat = hm[i].reshape(-1)
        max_idx = int(np.argmax(flat))
        scores[i] = flat[max_idx]
        y, x = np.unravel_index(max_idx, (h, w))
        keypoints[i] = [x * (original_w / w), y * (original_h / h)]
    return keypoints, scores


def make_fixtures(seed: int = 7):
    """Deterministic heatmap fixtures spanning the decode edge cases."""
    rng = np.random.default_rng(seed)
    J, h, w = 7, 128, 128
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)

    def gauss(cx, cy, sigma, amp):
        return amp * np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * sigma**2))

    fixtures = {}
    # 1. clean single peaks (the training-converged regime)
    kp = rng.uniform(8, 120, size=(J, 2)).astype(np.float32)
    clean = np.stack([gauss(x, y, 4.0, 6.0) - 3.0 for x, y in kp])
    fixtures["clean"] = clean.astype(np.float32)
    # 2. noisy peaks (mid-training regime)
    noisy = clean + rng.normal(0, 0.8, size=clean.shape)
    fixtures["noisy"] = noisy.astype(np.float32)
    # 3. multi-modal: a taller true peak + a decoy (occlusion/ambiguity regime)
    kp2 = rng.uniform(8, 120, size=(J, 2)).astype(np.float32)
    decoy = rng.uniform(8, 120, size=(J, 2)).astype(np.float32)
    multi = np.stack(
        [
            gauss(x, y, 4.0, 5.0) + gauss(dx, dy, 4.0, 4.0) - 3.0
            for (x, y), (dx, dy) in zip(kp2, decoy)
        ]
    )
    fixtures["multimodal"] = multi.astype(np.float32)
    # 4. near-flat low-confidence maps (failed-view regime; conf gate input)
    flat = rng.normal(-4.0, 0.05, size=(J, h, w))
    fixtures["lowconf"] = flat.astype(np.float32)
    return fixtures


def main() -> None:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax.numpy as jnp

    from mvropose_tpu.decode import decode_keypoints

    if FIXTURE_PATH.exists():
        data = dict(np.load(FIXTURE_PATH))
        fixtures = {k: v for k, v in data.items()}
        print(f"loaded fixtures from {FIXTURE_PATH}")
    else:
        fixtures = make_fixtures()
        FIXTURE_PATH.parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(FIXTURE_PATH, **fixtures)
        print(f"wrote fixtures to {FIXTURE_PATH}")

    image_hw = (1080, 1920)  # FHD, the reference's serve resolution
    print(f"\n{'fixture':<12}{'max |dxy| px':>14}{'max |dconf|':>14}{'pallas |dxy|':>14}")
    worst_xy = worst_conf = 0.0
    for name, hm in fixtures.items():
        ref_kp = np.stack([reference_decode(s, image_hw)[0] for s in hm[None]])[0]
        ref_sc = np.stack([reference_decode(s, image_hw)[1] for s in hm[None]])[0]
        xy_j, conf_j = decode_keypoints(
            jnp.asarray(hm), image_hw=image_hw, mode="argmax", use_pallas=False
        )
        d_xy = float(np.abs(np.asarray(xy_j) - ref_kp).max())
        d_conf = float(np.abs(np.asarray(conf_j) - ref_sc).max())
        try:
            xy_p, conf_p = decode_keypoints(
                jnp.asarray(hm)[None], image_hw=image_hw, mode="argmax", use_pallas=True
            )
            d_xy_p = float(np.abs(np.asarray(xy_p)[0] - ref_kp).max())
        except Exception as e:  # Pallas interpret mode may be unavailable
            d_xy_p = float("nan")
        print(f"{name:<12}{d_xy:>14.6f}{d_conf:>14.3e}{d_xy_p:>14.6f}")
        worst_xy = max(worst_xy, d_xy)
        worst_conf = max(worst_conf, d_conf)
    ok = worst_xy == 0.0 and worst_conf < 1e-6
    print(f"\nparity: max keypoint delta {worst_xy} px, max confidence delta "
          f"{worst_conf:.2e} -> {'EXACT' if ok else 'MISMATCH'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
