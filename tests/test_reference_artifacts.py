"""The GENUINE checked-in reference artifacts flow through the pipeline.

Pins the real files' counts and properties (VERDICT r2 missing item 3): all
8 factory ZED conf files parse with plausible optics, and all 7 real Fr5
trials (9,142 rows) run schema-normalization -> builder -> batching (the
missing-image path weights every sample 0) -> ROI -> grouping. Skipped when
the reference snapshot is absent.
"""

import glob
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/dataset")

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference snapshot absent")


def test_all_real_zed_confs_parse():
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
    from validate_reference_artifacts import validate_confs

    confs = validate_confs()
    assert len(confs) == 8
    # Every conf has FHD and a stereo baseline in the ZED range (63-120 mm).
    for rec in confs:
        assert rec["fhd"]
        assert 50.0 < rec["baseline_mm"] < 130.0, rec
    # The four FR3/Meca-insertion cameras also carry FHD1200.
    assert sum(1 for r in confs if r.get("fhd1200")) == 4


def test_all_real_fr5_trials_flow_through_pipeline():
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
    from validate_reference_artifacts import validate_trials

    trials = validate_trials()
    assert len(trials) == 7
    assert sum(t["rows"] for t in trials) == 9142
    for t in trials:
        assert t["rows"] == t["roi_rows"]
        assert 1290 <= t["rows"] <= 1320, t
        # 3 serials x 2 cam sides captured together -> groups of ~6 at the
        # reference's 50 ms Fr5 tolerance.
        assert t["mean_group_size"] > 5.5, t


def test_real_index_normalization_roundtrip():
    """Column mapping: dotted reference schema -> sync schema, exact values."""
    import pandas as pd

    from mvropose_tpu.data.builders import normalize_reference_index

    df = pd.read_csv(REF / "Fr5" / "Fr5_1th_250526" / "matched_index_with_roi.csv")
    norm = normalize_reference_index(df)
    assert len(norm) == len(df)
    np.testing.assert_allclose(norm["joint_1"], df["joint.0"].astype(float))
    np.testing.assert_allclose(norm["joint_6"], df["joint.5"].astype(float))
    np.testing.assert_allclose(norm["robot_timestamp"], df["img.ts"].astype(float))
    assert (norm["image_path"] == df["img.path"]).all()
    assert "roi.x1" in norm.columns
    # Idempotent.
    again = normalize_reference_index(norm)
    assert again is norm
