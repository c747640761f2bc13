"""Utils: metric writer, stage timer, viz panels, PCA probe."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvropose_tpu.utils import MetricWriter, StageTimer
from mvropose_tpu.utils.probe import pca_rgb, probe_backbone
from mvropose_tpu.utils.viz import prediction_panel, multi_view_panel, denormalize
from mvropose_tpu.models.vit import ViTBackbone, VIT_TINY_TEST


def test_metric_writer_jsonl(tmp_path):
    w = MetricWriter(tmp_path / "logs")
    w.write(1, {"loss": 1.5})
    w.write(2, {"loss": 1.0, "pck": 0.8})
    w.close()
    lines = (tmp_path / "logs" / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[1])
    assert rec["step"] == 2 and rec["pck"] == 0.8


def test_metric_writer_image(tmp_path, rng):
    w = MetricWriter(tmp_path / "logs")
    img = rng.integers(0, 255, size=(16, 16, 3)).astype(np.uint8)
    w.write_image(5, "panel", img)
    w.close()
    assert (tmp_path / "logs" / "images" / "panel_step5.png").exists()


def test_stage_timer():
    t = StageTimer()
    x = jnp.ones((64, 64))
    out = t.timed("matmul", lambda a: a @ a, x)
    assert out.shape == (64, 64)
    rep = t.report()
    assert rep["matmul"]["count"] == 1
    assert "matmul" in t.summary()


def test_pca_rgb_shapes(rng):
    toks = rng.normal(size=(2, 16, 32)).astype(np.float32)
    out = pca_rgb(jnp.asarray(toks), (4, 4))
    assert out.shape == (2, 4, 4, 3)
    assert out.dtype == np.uint8


def test_probe_backbone(rng):
    model = ViTBackbone(VIT_TINY_TEST)
    imgs = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), imgs)
    out = probe_backbone(model, variables, imgs)
    assert out.shape == (1, 4, 4, 3)


def test_prediction_panels(rng):
    img = rng.normal(size=(64, 64, 3)).astype(np.float32) * 0.5
    hm = rng.uniform(size=(3, 32, 32)).astype(np.float32)
    panel = prediction_panel(img, hm, hm)
    assert panel.shape == (64, 64 * 4, 3)
    mv = multi_view_panel(
        np.stack([img, img]), np.stack([hm, hm]), np.stack([hm, hm]),
        np.array([True, False]),
    )
    assert mv.shape == (64, 64 * 4, 3)  # only the masked-in view
    assert denormalize(img).dtype == np.uint8


def test_metric_writer_accepts_numpy_vectors(tmp_path):
    """Per-joint metrics arrive as numpy/jax arrays; float(ndarray) raises
    for length > 1, killing the train loop at the LOGGING call."""
    import json

    from mvropose_tpu.utils.metrics_writer import MetricWriter

    w = MetricWriter(tmp_path)
    w.write(3, {"loss": 0.5, "per_joint": np.array([0.1, 0.2, 0.3])})
    w.close()
    rec = json.loads((tmp_path / "metrics.jsonl").read_text().strip())
    assert rec["per_joint"] == [0.1, 0.2, 0.3]
