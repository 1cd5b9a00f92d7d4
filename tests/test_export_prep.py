"""Tests: StableHLO export, COCO JSON prep, misc utils, multi-scale buckets."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolov5m_tpu.data.coco_prep import coco91_to_coco80, convert_instances
from yolov5m_tpu.models import YOLOv5
from yolov5m_tpu.utils.export import (
    count_parameters, export_stablehlo, load_stablehlo, model_size_mb)
from yolov5m_tpu.utils.misc import StepTimer, seed_everything


def test_coco91_to_coco80_mapping():
    # golden values from the reference mapping (utils/utils.py:89-116);
    # the reference maps already-1-indexed labels
    assert coco91_to_coco80(1) == 1      # person stays
    assert coco91_to_coco80(11) == 11    # fire hydrant (last before gap)
    assert coco91_to_coco80(13) == 12    # stop sign (after missing 12)
    assert coco91_to_coco80(27) == 25    # backpack (after 12, 26 missing)
    assert coco91_to_coco80(90) == 80    # toothbrush → last class


def test_convert_instances(tmp_path):
    data = {
        "images": [{"id": 1, "file_name": "a.jpg"},
                   {"id": 2, "file_name": "b.jpg"}],
        "annotations": [
            {"image_id": 1, "category_id": 1, "bbox": [10, 20, 30, 40], "iscrowd": 0},
            {"image_id": 1, "category_id": 13, "bbox": [1, 2, 3, 4], "iscrowd": 0},
            {"image_id": 2, "category_id": 1, "bbox": [5, 5, 0, 10], "iscrowd": 0},  # w=0 dropped
            {"image_id": 2, "category_id": 2, "bbox": [1, 1, 5, 5], "iscrowd": 1},   # crowd dropped
        ],
    }
    jp = tmp_path / "inst.json"
    jp.write_text(json.dumps(data))
    n = convert_instances(str(jp), str(tmp_path / "labels"))
    assert n == 1  # only image 1 has valid annotations
    lines = (tmp_path / "labels" / "a.txt").read_text().strip().splitlines()
    assert lines[0] == "10.00 20.00 30.00 40.00 1"
    assert lines[1] == "1.00 2.00 3.00 4.00 12"  # 13 → 12


def test_export_stablehlo_roundtrip(tmp_path, rng):
    model = YOLOv5(first_out=8, nc=4, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    path = export_stablehlo(model, variables, str(tmp_path / "m.stablehlo"),
                            input_shape=(1, 64, 64, 3))
    assert os.path.getsize(path) > 1000

    fn = load_stablehlo(path)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    exported_out = fn(x)
    direct_out = model.apply(variables, x)
    for a, b in zip(exported_out, direct_out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_param_counters():
    model = YOLOv5(first_out=8, nc=4, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    n = count_parameters(variables)
    assert n > 100_000
    assert model_size_mb(variables) > 0.5


def test_seed_everything_returns_key():
    key = seed_everything(7)
    assert key.shape == (2,) or key.dtype  # a valid PRNGKey-like array
    a = np.random.rand()
    seed_everything(7)
    b = np.random.rand()
    assert a == b  # numpy reseeded deterministically


def test_step_timer():
    t = StepTimer()
    t.start()
    dt = t.stop()
    assert dt >= 0 and t.ema == dt


def test_multi_scale_buckets(tmp_path, rng):
    from PIL import Image
    from yolov5m_tpu.data.dataset import BatchLoader, DetectionDataset

    os.makedirs(tmp_path / "images" / "train")
    os.makedirs(tmp_path / "labels" / "train")
    for i in range(8):
        Image.fromarray(rng.integers(0, 255, (100, 100, 3), np.uint8)).save(
            tmp_path / "images" / "train" / f"i{i}.jpg")
        (tmp_path / "labels" / "train" / f"i{i}.txt").write_text("10 10 50 50 1\n")

    ds = DetectionDataset(str(tmp_path), train=True, max_boxes=8)
    loader = BatchLoader(ds, batch_size=2, shuffle=True, seed=3,
                         size_buckets=(64, 96, 128))
    sizes = {b["image"].shape[1] for b in loader}
    assert sizes <= {64, 96, 128}
    assert len(sizes) >= 2  # actually samples multiple buckets

    with pytest.raises(AssertionError):
        BatchLoader(ds, 2, size_buckets=(100,))  # not stride-32


def test_export_with_postprocess(tmp_path, rng):
    """Full detect pipeline (model+decode+NMS) exports and reloads."""
    model = YOLOv5(first_out=8, nc=4, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    path = export_stablehlo(model, variables, str(tmp_path / "det.stablehlo"),
                            input_shape=(1, 64, 64, 3), with_postprocess=True,
                            conf=0.3, iou=0.5)
    fn = load_stablehlo(path)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    out, valid = fn(x)
    assert out.shape == (1, 300, 6)
    assert valid.shape == (1, 300)
