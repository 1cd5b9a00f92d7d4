"""SYSTEM-level mAP parity: this framework vs the ACTUAL torch reference.

The north-star acceptance criterion (BASELINE.md) is throughput ≥2x A100
**with mAP50 parity ±0.5**. Per-op oracles (tests/test_reference_oracle.py)
pin forward/decode/NMS numerics; this harness operationalizes the
ACCEPTANCE sentence end-to-end (round-4 review Missing #1 / Next #3):

  identical weights → both FULL systems → each its own decode+NMS →
  both prediction sets scored by eval/metrics.py (COCO-style 101-pt)
  against the exact labels → |Δ mAP50| must be ≤ 0.5.

 - weights: the committed flagship blob (weights/flagship_synth_bf16
   .msgpack), exported flax→torch via models/weights.py
   export_torch_state_dict (the oracle-pinned mapping), loaded
   strict=True into the reference YOLOV5m.
 - scenes: deterministic structured synthetic images + exact labels
   (data/synthetic.py — the distribution the blob was trained on).
 - reference path: reference model.py YOLOV5m forward (eval mode, live
   BN running stats) → plot_utils.cells_to_bboxes(is_pred=True)
   → bboxes_utils.non_max_suppression (its class-offset torch NMS,
   reference bboxes_utils.py:175-209) — the reference's OWN serving
   pipeline, quirks included, run through tests/reference_oracle.py's
   import harness (stubs only where this environment lacks its deps).
 - our path: fused bf16-free f32 apply + ops/postprocess.fused_detect
   (BN folded on device semantics, top-k gate, exact class-masked NMS).
 - scoring: eval/metrics.MeanAP (validated against torchmetrics /
   pycocotools conventions in tests/test_eval.py) on both.

Both sides use the same conf/IoU thresholds (reference eval defaults:
conf 0.01, NMS IoU 0.6 — reference config.py:26-27).

Run:  PYTHONPATH=. python benchmarks/map_parity.py --images 200 --bs 4
The committed record lives in MAP_PARITY.md. A fast suite-pinned version
runs in tests/test_map_parity.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def load_flagship_variables():
    """Committed flagship weights as f32 flax variables (unfused)."""
    from yolov5m_tpu.models.weights import load_flagship
    return load_flagship(fold=False)[0]


def build_reference_model(variables, first_out, nc):
    """Reference YOLOV5m carrying OUR weights (strict load)."""
    import torch
    from reference_oracle import import_reference

    from yolov5m_tpu.models.weights import export_torch_state_dict

    ref = import_reference()
    model = ref.model.YOLOV5m(
        first_out=first_out, nc=nc, anchors=ref.config.ANCHORS,
        ch=(first_out * 4, first_out * 8, first_out * 16), inference=False)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_torch_state_dict(variables).items()}
    missing, unexpected = model.load_state_dict(sd, strict=False)
    # num_batches_tracked is torch BN bookkeeping with no flax analog;
    # head.anchors / head.stride are constructor-initialized buffers holding
    # the same config.ANCHORS constants both frameworks share (our side
    # passes them as jit constants via normalized_anchors())
    real_missing = [k for k in missing
                    if "num_batches_tracked" not in k
                    and k not in ("head.anchors", "head.stride")]
    assert not real_missing, f"missing torch keys: {real_missing[:4]}"
    assert not unexpected, f"unexpected torch keys: {unexpected[:4]}"
    model.eval()
    return ref, model


def run_parity(n_images=200, bs=4, hw=640, conf=0.01, iou=0.6,
               first_out=48, nc=80, seed=123, variables=None,
               log=print):
    import torch

    import jax
    import jax.numpy as jnp

    from yolov5m_tpu.data.synthetic import synth_batch
    from yolov5m_tpu.eval.metrics import MeanAveragePrecision
    from yolov5m_tpu.models import YOLOv5
    from yolov5m_tpu.models.fuse import fold_batchnorm
    from yolov5m_tpu.models.yolo import normalized_anchors
    from yolov5m_tpu.ops.postprocess import fused_detect

    if variables is None:
        variables = load_flagship_variables()
    ref, ref_model = build_reference_model(variables, first_out, nc)

    model = YOLOv5(first_out=first_out, nc=nc, dtype=jnp.float32, fused=True)
    folded = fold_batchnorm(variables)
    anchors = jnp.asarray(normalized_anchors())

    @jax.jit
    def ours(v, x):
        preds = model.apply(v, x, train=False)
        return fused_detect(preds, anchors, conf_threshold=conf,
                            iou_threshold=iou, max_detections=300,
                            pre_nms_topk=1024)

    @jax.jit
    def scenes(k):
        return synth_batch(k, bs, hw, nc)

    m_ours, m_ref = MeanAveragePrecision(), MeanAveragePrecision()
    n_batches = (n_images + bs - 1) // bs
    t0 = time.time()
    for b in range(n_batches):
        imgs, labels, mask = jax.device_get(
            scenes(jax.random.fold_in(jax.random.PRNGKey(seed), b)))

        det, valid = jax.device_get(ours(folded, jnp.asarray(imgs)))

        x_t = torch.from_numpy(np.transpose(imgs, (0, 3, 1, 2)).copy())
        with torch.no_grad():
            preds_t = ref_model(x_t)
            rows = ref.plot_utils.cells_to_bboxes(
                preds_t, ref_model.head.anchors, ref_model.head.stride,
                is_pred=True, to_list=False)
            ref_out = ref.bboxes_utils.non_max_suppression(
                rows, iou_threshold=iou, threshold=conf, tolist=True)

        for i in range(bs):
            mi = mask[i].astype(bool)
            gt_cxy = labels[i, mi, 1:3] * hw
            gt_wh = labels[i, mi, 3:5] * hw
            gt = {"boxes": np.concatenate(
                      [gt_cxy - gt_wh / 2, gt_cxy + gt_wh / 2], axis=-1),
                  "labels": labels[i, mi, 0].astype(int)}

            vi = valid[i].astype(bool)
            m_ours.update({"boxes": det[i, vi, 2:6],
                           "scores": det[i, vi, 1],
                           "labels": det[i, vi, 0].astype(int)}, gt)

            rb = np.asarray(ref_out[i], np.float32).reshape(-1, 6)
            m_ref.update({"boxes": rb[:, 2:6], "scores": rb[:, 1],
                          "labels": rb[:, 0].astype(int)}, gt)
        if (b + 1) % 5 == 0 or b == n_batches - 1:
            log(f"  batch {b + 1}/{n_batches} "
                f"({(b + 1) * bs} images, {time.time() - t0:.0f}s)")

    r_ours, r_ref = m_ours.compute(), m_ref.compute()
    return {
        "images": n_batches * bs, "hw": hw, "conf": conf, "iou": iou,
        "ours": {"mAP50": round(float(r_ours["map_50"]), 4),
                 "mAP50_95": round(float(r_ours["map"]), 4)},
        "reference": {"mAP50": round(float(r_ref["map_50"]), 4),
                      "mAP50_95": round(float(r_ref["map"]), 4)},
        "delta_mAP50": round(float(r_ours["map_50"] - r_ref["map_50"]), 4),
        "delta_mAP50_95": round(float(r_ours["map"] - r_ref["map"]), 4),
        "acceptance_band": 0.5,
        "within_band": bool(
            abs(float(r_ours["map_50"] - r_ref["map_50"])) <= 0.5),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=200)
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--hw", type=int, default=640)
    ap.add_argument("--conf", type=float, default=0.01)
    ap.add_argument("--iou", type=float, default=0.6)
    ap.add_argument("--cpu", action="store_true",
                    help="force the JAX side onto CPU (the torch reference "
                         "forward dominates wall time anyway); frees the "
                         "TPU for concurrent work. Env vars alone cannot "
                         "override the axon plugin (CLAUDE.md), hence a "
                         "config flag.")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    result = run_parity(n_images=args.images, bs=args.bs, hw=args.hw,
                        conf=args.conf, iou=args.iou)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
