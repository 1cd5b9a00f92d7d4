"""Batching detection server (serving/server.py) end-to-end over real sockets.

A tiny fused model serves the length-prefixed protocol on an ephemeral port;
responses must match the direct pipeline (same native letterbox + fused_detect
+ unletterbox) bit-for-bit within float tolerance, survive concurrent clients
(the batching path), and degrade per-request on undecodable input.
"""

import io
import threading

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from yolov5m_tpu.models import YOLOv5
from yolov5m_tpu.models.fuse import fold_batchnorm
from yolov5m_tpu.models.yolo import normalized_anchors
from yolov5m_tpu.ops.postprocess import fused_detect
from yolov5m_tpu.serving import DetectionClient, DetectionServer

NC = 4
S = 64
LABELS = ["a", "b", "c", "d"]
KW = dict(conf_threshold=0.01, iou_threshold=0.45, max_detections=16,
          pre_nms_topk=32)


@pytest.fixture(scope="module")
def served():
    model = YOLOv5(first_out=8, nc=NC, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, S, S, 3), jnp.float32))
    fused = model.clone(fused=True)
    fused_vars = fold_batchnorm(variables)
    server = DetectionServer(fused, fused_vars, normalized_anchors(),
                             labels=LABELS, image_size=S, batch_size=4,
                             max_wait_ms=10.0, **KW)
    with server:
        yield server, fused, fused_vars


def _jpeg(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=95)
    return buf.getvalue()


def _expected(fused, variables, jpeg_bytes):
    """The direct pipeline the server must reproduce."""
    from yolov5m_tpu.data.native import letterbox
    from yolov5m_tpu.ops.boxes import unletterbox_boxes

    img = np.asarray(Image.open(io.BytesIO(jpeg_bytes)).convert("RGB"))
    boxed, ratio, (dw, dh) = letterbox(img, (S, S))
    x = jnp.asarray(boxed[None].astype(np.float32) / 255.0)
    preds = fused.apply(variables, x, train=False)
    det, valid = jax.device_get(fused_detect(
        preds, jnp.asarray(normalized_anchors()), **KW))
    rows = det[0][valid[0]]
    boxes = (np.asarray(unletterbox_boxes(rows[:, 2:6].copy(), ratio,
                                          (dw, dh), img.shape[:2]))
             if len(rows) else np.zeros((0, 4)))
    return rows, boxes, img.shape[:2]


def _check_matches(resp, rows, boxes, orig_hw):
    assert resp["ok"] is True
    assert (resp["height"], resp["width"]) == tuple(orig_hw)
    assert len(resp["detections"]) == len(rows)
    for d, r, b in zip(resp["detections"], rows, boxes):
        assert d["class_id"] == int(r[0])
        assert d["label"] == LABELS[int(r[0])]
        np.testing.assert_allclose(d["confidence"], r[1], atol=1e-4)
        np.testing.assert_allclose(d["box"], b, atol=0.02)


def test_serving_matches_direct_pipeline(served, rng):
    server, fused, variables = served
    with DetectionClient(port=server.port) as client:
        # distinct sizes: aspect-preserving letterbox geometry per image
        for shape in ((48, 80, 3), (100, 52, 3), (64, 64, 3)):
            data = _jpeg(rng.integers(0, 255, shape, np.uint8))
            resp = client.detect(data)
            rows, boxes, orig_hw = _expected(fused, variables, data)
            _check_matches(resp, rows, boxes, orig_hw)
            assert rows.size, "degenerate test: no detections at conf=0.01"


def test_serving_concurrent_clients(served, rng):
    """More in-flight requests than one batch: exercises padding + batching;
    every client gets its own image's answer back, in its request order."""
    server, fused, variables = served
    datas = [_jpeg(rng.integers(0, 255, (40 + 4 * i, 60, 3), np.uint8))
             for i in range(6)]
    expected = [_expected(fused, variables, d) for d in datas]
    results = [None] * len(datas)

    def run(i):
        with DetectionClient(port=server.port) as client:
            r1 = client.detect(datas[i])
            r2 = client.detect(datas[i])  # pipelined second request
            results[i] = (r1, r2)

    threads = [threading.Thread(target=run, args=(i,))
               for i in range(len(datas))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    for i, pair in enumerate(results):
        assert pair is not None, f"client {i} timed out"
        rows, boxes, orig_hw = expected[i]
        for resp in pair:
            _check_matches(resp, rows, boxes, orig_hw)


def test_serving_png_fallback(served, rng):
    """Non-JPEG input takes the PIL decode fallback, same geometry."""
    server, fused, variables = served
    arr = rng.integers(0, 255, (30, 70, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "PNG")
    png = buf.getvalue()
    with DetectionClient(port=server.port) as client:
        resp = client.detect(png)
    assert resp["ok"] is True
    assert (resp["height"], resp["width"]) == (30, 70)


def test_serving_pipelined_sustained_load(served, rng):
    """Sustained multi-batch traffic exercises the depth-1 overlap path
    (batch i+1 dispatched before batch i's results are fetched): every
    request still gets its own image's answer, in order, per connection."""
    server, fused, variables = served
    datas = [_jpeg(rng.integers(0, 255, (36 + 2 * i, 44, 3), np.uint8))
             for i in range(4)]
    expected = [_expected(fused, variables, d) for d in datas]
    results = [None] * len(datas)

    def run(i):
        with DetectionClient(port=server.port) as client:
            # 5 back-to-back requests per client: with batch_size=4 and 4
            # clients this spans >=5 device batches, keeping one in flight
            results[i] = [client.detect(datas[i]) for _ in range(5)]

    threads = [threading.Thread(target=run, args=(i,))
               for i in range(len(datas))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    for i, resps in enumerate(results):
        assert resps is not None, f"client {i} timed out"
        rows, boxes, orig_hw = expected[i]
        for resp in resps:
            _check_matches(resp, rows, boxes, orig_hw)


def test_serving_no_overlap_mode(rng):
    """overlap=False (strict one-batch-at-a-time) serves identically."""
    model = YOLOv5(first_out=8, nc=NC, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, S, S, 3), jnp.float32))
    fused = model.clone(fused=True)
    fused_vars = fold_batchnorm(variables)
    server = DetectionServer(fused, fused_vars, normalized_anchors(),
                             labels=LABELS, image_size=S, batch_size=2,
                             max_wait_ms=5.0, overlap=False, **KW)
    data = _jpeg(rng.integers(0, 255, (50, 66, 3), np.uint8))
    with server, DetectionClient(port=server.port) as client:
        for _ in range(3):
            resp = client.detect(data)
            rows, boxes, orig_hw = _expected(fused, fused_vars, data)
            _check_matches(resp, rows, boxes, orig_hw)


def test_serving_bad_input_is_per_request(served, rng):
    """Garbage bytes error that request only; the connection stays usable."""
    server, fused, variables = served
    with DetectionClient(port=server.port) as client:
        bad = client.detect(b"definitely not an image")
        assert bad["ok"] is False and "undecodable" in bad["error"]
        data = _jpeg(rng.integers(0, 255, (32, 32, 3), np.uint8))
        good = client.detect(data)
        assert good["ok"] is True


def test_serving_oversized_frame_rides_the_fifo(served, rng, monkeypatch):
    """An over-limit frame errors IN ORDER (not out-of-band ahead of queued
    requests) and the connection stays framed and usable afterwards."""
    import yolov5m_tpu.serving.server as srv_mod
    monkeypatch.setattr(srv_mod, "_MAX_REQUEST", 16384)
    server, fused, variables = served
    small = _jpeg(rng.integers(0, 255, (24, 24, 3), np.uint8))
    assert len(small) <= 16384
    big = bytes(65536)  # > patched limit; payload still fully drained
    with DetectionClient(port=server.port) as client:
        # pipeline: good request first, oversized second — replies must
        # come back in that order on this connection
        client.send(small)
        client.send(big)
        first = client.recv()
        second = client.recv()
        assert first["ok"] is True
        assert second["ok"] is False and "too large" in second["error"]
        # connection still framed: a normal request succeeds
        assert client.detect(small)["ok"] is True


def test_serving_dp_mesh(served, rng):
    """dp_mesh: the server's device batch runs through the shard_mapped DP
    pipeline (parallel/infer.py) — responses must equal the single-device
    server's for the same requests."""
    from yolov5m_tpu.parallel import make_mesh

    _, fused, variables = served
    fused_vars = variables
    server = DetectionServer(fused, fused_vars, normalized_anchors(),
                             labels=LABELS, image_size=S, batch_size=4,
                             max_wait_ms=10.0, dp_mesh=make_mesh(4), **KW)
    data = _jpeg(rng.integers(0, 255, (44, 58, 3), np.uint8))
    with server, DetectionClient(port=server.port) as client:
        resp = client.detect(data)
    rows, boxes, orig_hw = _expected(fused, fused_vars, data)
    _check_matches(resp, rows, boxes, orig_hw)


def test_serving_tp_mesh(served, rng):
    """tp_mesh: conv channels sharded over the model axis, batch over the
    data axis (parallel/tp.py) — responses must equal the single-device
    server's for the same requests."""
    from yolov5m_tpu.parallel import make_tp_mesh

    _, fused, variables = served
    fused_vars = variables
    server = DetectionServer(fused, fused_vars, normalized_anchors(),
                             labels=LABELS, image_size=S, batch_size=4,
                             max_wait_ms=10.0,
                             tp_mesh=make_tp_mesh(n_data=2, n_model=2), **KW)
    data = _jpeg(rng.integers(0, 255, (44, 58, 3), np.uint8))
    with server, DetectionClient(port=server.port) as client:
        resp = client.detect(data)
    rows, boxes, orig_hw = _expected(fused, fused_vars, data)
    _check_matches(resp, rows, boxes, orig_hw)


def test_serving_restart(rng):
    """stop() then start() serves again (stop flag cleared, queue drained)."""
    model = YOLOv5(first_out=8, nc=NC, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(2),
                           jnp.zeros((1, S, S, 3), jnp.float32))
    fused = model.clone(fused=True)
    fused_vars = fold_batchnorm(variables)
    server = DetectionServer(fused, fused_vars, normalized_anchors(),
                             labels=LABELS, image_size=S, batch_size=2,
                             max_wait_ms=5.0, **KW)
    data = _jpeg(rng.integers(0, 255, (40, 40, 3), np.uint8))
    server.start()
    try:
        with DetectionClient(port=server.port) as client:
            assert client.detect(data)["ok"] is True
    finally:
        server.stop()
    server.start(warmup=False)  # already compiled; may get a fresh port
    try:
        with DetectionClient(port=server.port) as client:
            assert client.detect(data)["ok"] is True
    finally:
        server.stop()
