"""Pin the committed flagship weights to the claims in their sidecar.

weights/flagship_synth_bf16.msgpack backs bench.py's realistic-load
headline (the trained arm). bench.py degrades SILENTLY to the noise
protocol if the blob is missing or unloadable (load_flagship's
missing_ok gate), so nothing else would notice a rotten/replaced file. This test
keeps the headline's realism claim attached to the actual bytes
(round-4 review Weak #5 / Next #5):

 1. the blob's sha256 matches the hash recorded in the provenance
    sidecar (weights/flagship_synth_bf16.json);
 2. the blob loads, BN-folds, and runs one bs=4 structured batch drawn
    from the training distribution (data/synthetic.py);
 3. detections/image on that batch is NONZERO and within a generous
    band around the sidecar's recorded density — i.e. the weights
    really are a trained detector on this load, not noise.

Reference analog: the reference ships no weights and has no provenance
checks; this pins the part of OUR perf record that depends on a binary.
"""

import hashlib
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BLOB = os.path.join(REPO, "weights", "flagship_synth_bf16.msgpack")
SIDECAR = os.path.join(REPO, "weights", "flagship_synth_bf16.json")


@pytest.fixture(scope="module")
def sidecar():
    assert os.path.isfile(BLOB), (
        "committed flagship weights missing — bench.py would silently "
        "fall back to the noise protocol")
    assert os.path.isfile(SIDECAR), "provenance sidecar missing"
    with open(SIDECAR) as f:
        return json.load(f)


def test_blob_matches_sidecar_hash(sidecar):
    with open(BLOB, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()
    assert "sha256" in sidecar, "sidecar records no content hash"
    assert digest == sidecar["sha256"], (
        "weights blob does not match the provenance sidecar — the bytes "
        "backing the bench headline have been replaced or corrupted")


def test_weights_load_and_detect_in_density_band(sidecar):
    from yolov5m_tpu.config import Config
    from yolov5m_tpu.data.synthetic import synth_batch
    from yolov5m_tpu.models import YOLOv5
    from yolov5m_tpu.models.weights import FLAGSHIP_WEIGHTS, load_flagship
    from yolov5m_tpu.models.yolo import normalized_anchors
    from yolov5m_tpu.ops.postprocess import fused_detect

    # the shared loader every harness (bench.py, map_parity, latency) uses
    # must point at the same bytes this test hash-pins
    assert os.path.abspath(FLAGSHIP_WEIGHTS) == os.path.abspath(BLOB)
    variables, meta = load_flagship(fold=True)
    assert meta is not None and "sha256" in meta

    cfg = Config()
    model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc,
                   dtype=jnp.float32, fused=True)
    anchors = jnp.asarray(normalized_anchors())

    # same statistic definition and conf threshold as the sidecar's
    # density_at_conf_0.25 record (train_flagship_synth.py)
    bs = 4
    imgs, _, _ = jax.jit(
        lambda k: synth_batch(k, bs, 640, cfg.nc))(jax.random.PRNGKey(7))

    @jax.jit
    def detect(v, x):
        preds = model.apply(v, x, train=False)
        _, valid = fused_detect(preds, anchors, conf_threshold=0.25,
                                iou_threshold=0.45, max_detections=64,
                                pre_nms_topk=256)
        return valid.sum()

    det_per_img = float(jax.device_get(detect(variables, imgs))) / bs

    band = sidecar["density_at_conf_0.25"]["structured"]
    recorded = float(band["detections_per_image"])
    assert recorded > 0, "sidecar records zero density — stale provenance"
    # generous band: one bs=4 draw of a distribution whose recorded mean
    # came from many batches. Guards "trained detector" vs "noise" (noise
    # weights record 0.0/image), not exact density reproduction.
    assert det_per_img > 0.5, (
        f"trained flagship weights produced {det_per_img}/image on an "
        "in-distribution batch — blob is not a trained detector")
    assert det_per_img < recorded * 6 + 10, (
        f"{det_per_img}/image vastly exceeds the recorded density "
        f"{recorded}/image — weights don't match their provenance")
