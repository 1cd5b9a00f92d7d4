"""Inference CLI — the reference detect.py equivalent (reference
detect.py:16-55), with its broken checkpoint-loading and kwarg bugs fixed
(SURVEY.md §2 quirks) and the whole forward+decode+NMS pipeline jitted.

Usage:
  python -m yolov5m_tpu.cli.detect --checkpoint SAVED_CHECKPOINT/model_1/checkpoint_epoch_8.msgpack \
      --img path/to/image.jpg --nc 2 --save_pred
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np
from PIL import Image


def arg_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", type=str, default=None,
                   help="msgpack checkpoint (full TrainState or bare variables)")
    p.add_argument("--weights", type=str, default=None,
                   help="npz of torch-layout weights (alternative to --checkpoint)")
    p.add_argument("--img", type=str, default=None)
    p.add_argument("--img_dir", type=str, default=None,
                   help="pick a random image from this directory when --img "
                        "is not given (reference detect.py:38-40 behavior)")
    p.add_argument("--nc", type=int, default=2, help="number of classes (FLIR=2)")
    p.add_argument("--labels", type=str, default=None,
                   help="comma-separated class names; default FLIR or COCO by nc")
    p.add_argument("--first_out", type=int, default=None,
                   help="width override (default: from --model)")
    p.add_argument("--model", type=str, default="m",
                   choices=["n", "s", "m", "l", "x"],
                   help="YOLOv5 family variant")
    p.add_argument("--image_size", type=int, default=640)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--iou", type=float, default=0.45)
    p.add_argument("--save_pred", action="store_true",
                   help="save annotated image under detections_exp/")
    p.add_argument("--fuse", action="store_true",
                   help="fold BatchNorm into convs for inference")
    p.add_argument("--int8", action="store_true",
                   help="post-training int8 quantization (implies --fuse; "
                        "calibrates on the input image; models/quantize.py)")
    p.add_argument("--all", action="store_true",
                   help="with --img_dir: process EVERY image (batched "
                        "inference), not one random image")
    p.add_argument("--bs", type=int, default=16,
                   help="batch size for --all directory mode")
    p.add_argument("--anchors", type=str, default=None,
                   help="anchors.json from an --autoanchor training run "
                        "(SAVED_CHECKPOINT/{run}/anchors.json)")
    p.add_argument("--out", type=str, default="detections_exp")
    return p.parse_args()


def load_variables(opt, model, jnp):
    import jax
    from yolov5m_tpu.models.weights import convert_torch_state_dict
    from flax import serialization

    def init_template():
        # jitted init: ONE dispatch instead of hundreds of eager per-op
        # calls — an eager flax init over a tunneled relay measured 1734s
        # in a degraded window (CLAUDE.md session-6 / bench.py postmortem)
        return jax.jit(lambda r: model.init(
            r, jnp.zeros((1, opt.image_size, opt.image_size, 3))))(
                jax.random.PRNGKey(0))

    # precedence: --weights wins over --checkpoint (unchanged CLI
    # contract); --checkpoint alone needs NO template (msgpack_restore is
    # structure-free), so only the weights/random paths pay the init
    if opt.weights:
        sd = dict(np.load(opt.weights))
        return convert_torch_state_dict(sd, jax.device_get(init_template()))
    if opt.checkpoint:
        with open(opt.checkpoint, "rb") as f:
            blob = f.read()
        state = serialization.msgpack_restore(blob)
        # accept either a full TrainState dump or bare variables
        if "params" in state and "batch_stats" in state:
            params = state.get("ema_params") or state["params"]
            return {"params": params, "batch_stats": state["batch_stats"]}
        raise SystemExit("unrecognized checkpoint structure")
    print("WARNING: no --checkpoint/--weights given; using random init")
    return init_template()


def main(opt):
    import jax
    import jax.numpy as jnp

    from yolov5m_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()

    from yolov5m_tpu.config import COCO_LABELS, FLIR_LABELS, Config
    from yolov5m_tpu.data.native import letterbox
    from yolov5m_tpu.models import YOLOv5
    from yolov5m_tpu.models.yolo import normalized_anchors
    from yolov5m_tpu.ops.postprocess import fused_detect
    from yolov5m_tpu.utils.plotting import plot_image

    if opt.labels:
        labels = opt.labels.split(",")
    else:
        labels = FLIR_LABELS if opt.nc == 2 else COCO_LABELS

    from yolov5m_tpu.models.yolo import FAMILY

    fam_fo, fam_dm = FAMILY[getattr(opt, "model", "m")]
    first_out = opt.first_out if opt.first_out is not None else fam_fo
    cfg = Config(first_out=first_out, nc=opt.nc, image_size=opt.image_size)
    model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16,
                   depth_mult=fam_dm)
    variables = load_variables(opt, model, jnp)
    if getattr(opt, "fuse", False):
        from yolov5m_tpu.models.fuse import fold_batchnorm
        variables = fold_batchnorm(variables)
        model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc,
                       dtype=jnp.bfloat16, fused=True, depth_mult=fam_dm)
    if getattr(opt, "anchors", None):
        import json
        with open(opt.anchors) as f:
            anchors_px = np.asarray(json.load(f), np.float32)
        anchors_norm = jnp.asarray(normalized_anchors(anchors=anchors_px))
        print(f"==> using anchors from {opt.anchors}")
    else:
        anchors_norm = jnp.asarray(normalized_anchors())

    if getattr(opt, "all", False):
        assert getattr(opt, "img_dir", None), "--all needs --img_dir"
        if getattr(opt, "int8", False):
            from yolov5m_tpu.models.quantize import quantize_int8
            model, variables = _quantize_on_dir(opt, model, variables,
                                                quantize_int8, jnp)
        _detect_dir(opt, model, variables, anchors_norm, cfg, labels)
        return

    img_path = opt.img
    if img_path is None:
        import random
        assert getattr(opt, "img_dir", None), "give --img or --img_dir"
        candidates = sorted(
            f for f in os.listdir(opt.img_dir)
            if f.lower().endswith((".jpg", ".jpeg", ".png")))
        if not candidates:
            raise SystemExit(f"no images in {opt.img_dir}")
        img_path = os.path.join(opt.img_dir, random.choice(candidates))
        print(f"random image: {img_path}")
    opt.img = img_path

    raw = np.asarray(Image.open(img_path).convert("RGB"))
    img, ratio, (dw, dh) = letterbox(raw, (opt.image_size, opt.image_size))
    x = jnp.asarray(img[None].astype(np.float32) / 255.0)

    if getattr(opt, "int8", False):
        from yolov5m_tpu.models.quantize import quantize_int8
        model, variables = quantize_int8(model, variables, [x])
        print("==> int8 PTQ (calibrated on the input image)")

    @jax.jit
    def infer(v, x):
        preds = model.apply(v, x, train=False)
        return fused_detect(preds, anchors_norm, conf_threshold=opt.conf,
                            iou_threshold=opt.iou,
                            max_detections=cfg.max_detections,
                            pre_nms_topk=cfg.topk_for_conf(opt.conf))

    t0 = time.perf_counter()
    det, valid = infer(variables, x)
    det = np.asarray(det)[0]
    valid = np.asarray(valid)[0]
    print(f"inference (incl. compile): {time.perf_counter() - t0:.2f}s")

    rows = det[valid]
    # detections come out in 640-letterbox space; map back onto the source
    # image (inverse resize + pad removal) so coordinates are user-facing
    # original-image pixels, like the reference's rescale_bboxes contract
    # (reference utils/bboxes_utils.py:116-126)
    if len(rows):
        from yolov5m_tpu.ops.boxes import unletterbox_boxes_np
        rows = rows.copy()
        rows[:, 2:6] = unletterbox_boxes_np(
            rows[:, 2:6], ratio, (dw, dh), raw.shape[:2])
    print(f"{len(rows)} detections (original-image coords, "
          f"{raw.shape[1]}x{raw.shape[0]}):")
    for r in rows:
        name = labels[int(r[0])] if int(r[0]) < len(labels) else str(int(r[0]))
        print(f"  {name:>14s} {r[1]:.3f} [{r[2]:.0f}, {r[3]:.0f}, {r[4]:.0f}, {r[5]:.0f}]")

    if opt.save_pred:
        os.makedirs(opt.out, exist_ok=True)
        out_path = os.path.join(
            opt.out, os.path.splitext(os.path.basename(opt.img))[0] + "_pred.png")
        plot_image(raw.astype(np.float32) / 255.0, rows, labels,
                   save_path=out_path)
        print(f"saved {out_path}")


def _quantize_on_dir(opt, model, variables, quantize_int8, jnp):
    """int8 PTQ for directory mode: calibrate on the first few images."""
    from yolov5m_tpu.data.native import letterbox, load_image_rgb

    names = sorted(f for f in os.listdir(opt.img_dir)
                   if f.lower().endswith((".jpg", ".jpeg", ".png")))[:8]
    imgs = []
    for name in names:
        raw = load_image_rgb(os.path.join(opt.img_dir, name))
        img, _, _ = letterbox(raw, (opt.image_size, opt.image_size))
        imgs.append(img.astype(np.float32) / 255.0)
    calib = [jnp.asarray(np.stack(imgs))]
    model, variables = quantize_int8(model, variables, calib)
    print(f"==> int8 PTQ (calibrated on {len(imgs)} images)")
    return model, variables


def _detect_dir(opt, model, variables, anchors_norm, cfg, labels):
    """Batched inference over every image in --img_dir: host letterbox to a
    common canvas, fixed-shape batches through ONE jitted graph, detections
    unletterboxed per image back to its own source coordinates. Results go
    to stdout and (with --save_pred) annotated images + a detections.json
    under --out."""
    import json

    import jax
    import jax.numpy as jnp

    from yolov5m_tpu.data.native import letterbox, load_image_rgb
    from yolov5m_tpu.ops.boxes import unletterbox_boxes_np
    from yolov5m_tpu.ops.postprocess import fused_detect
    from yolov5m_tpu.utils.plotting import plot_image

    names = sorted(f for f in os.listdir(opt.img_dir)
                   if f.lower().endswith((".jpg", ".jpeg", ".png")))
    assert names, f"no images in {opt.img_dir}"
    bs = max(1, opt.bs)
    size = opt.image_size
    anchors = jnp.asarray(anchors_norm)

    @jax.jit
    def infer(v, x):
        # uint8 ingress, normalize on device: 1 byte/pixel host->device
        # instead of 4 (bit-identical for all 256 codes either dtype —
        # ops/preprocess.py normalize_uint8)
        from yolov5m_tpu.ops.preprocess import normalize_uint8
        x = normalize_uint8(x, getattr(model, "dtype", None) or jnp.float32)
        preds = model.apply(v, x, train=False)
        return fused_detect(preds, anchors, conf_threshold=opt.conf,
                            iou_threshold=opt.iou,
                            max_detections=cfg.max_detections,
                            pre_nms_topk=cfg.topk_for_conf(opt.conf))

    if opt.save_pred:
        os.makedirs(opt.out, exist_ok=True)
    all_results = {}
    t0 = time.perf_counter()
    for start in range(0, len(names), bs):
        chunk = names[start:start + bs]
        raws, geoms = [], []
        batch = np.full((bs, size, size, 3), 114, np.uint8)  # pad short batch
        for j, name in enumerate(chunk):
            raw = load_image_rgb(os.path.join(opt.img_dir, name))
            img, ratio, (dw, dh) = letterbox(raw, (size, size))
            batch[j] = img
            raws.append(raw)
            geoms.append((ratio, (dw, dh)))
        det, valid = infer(variables, jnp.asarray(batch))
        det, valid = np.asarray(det), np.asarray(valid)
        for j, name in enumerate(chunk):
            rows = det[j][valid[j]].copy()
            ratio, (dw, dh) = geoms[j]
            if len(rows):
                # numpy twin: the jnp version costs ~10 eager device
                # dispatches per image on this host-side loop
                rows[:, 2:6] = unletterbox_boxes_np(
                    rows[:, 2:6], ratio, (dw, dh), raws[j].shape[:2])
            all_results[name] = [
                {"class": labels[int(r[0])] if int(r[0]) < len(labels)
                 else str(int(r[0])),
                 "conf": float(r[1]),
                 "box_xyxy": [float(v) for v in r[2:6]]} for r in rows]
            print(f"{name}: {len(rows)} detections")
            if opt.save_pred:
                out_path = os.path.join(
                    opt.out, os.path.splitext(name)[0] + "_pred.png")
                plot_image(raws[j].astype(np.float32) / 255.0, rows, labels,
                           save_path=out_path)
    dt = time.perf_counter() - t0
    print(f"{len(names)} images in {dt:.2f}s ({len(names)/dt:.1f} img/s "
          f"incl. host decode + compile)")
    if opt.save_pred:
        with open(os.path.join(opt.out, "detections.json"), "w") as f:
            json.dump(all_results, f, indent=1)
        print(f"saved {opt.out}/detections.json")


def cli():
    """Console-script entry point (pyproject.toml [project.scripts])."""
    main(arg_parser())


if __name__ == "__main__":
    main(arg_parser())
