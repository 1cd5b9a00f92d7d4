"""Serving CLI: run the batching detection server (serving/server.py).

The production counterpart of cli/detect.py — same checkpoint/weights
loading and model flags, but instead of one image it serves the
length-prefixed TCP protocol until interrupted. BatchNorm is folded by
default (serving always wants the fused graph; --no_fuse for debugging).

Usage:
  python -m yolov5m_tpu.cli.serve --checkpoint ....msgpack --nc 2 \
      --port 5005 --bs 128

  # client side:
  #   from yolov5m_tpu.serving import DetectionClient
  #   with DetectionClient(port=5005) as c:
  #       print(c.detect(open("img.jpg", "rb").read()))
"""

from __future__ import annotations

import argparse


def arg_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--weights", type=str, default=None,
                   help="npz of torch-layout weights")
    p.add_argument("--nc", type=int, default=2)
    p.add_argument("--labels", type=str, default=None,
                   help="comma-separated class names; default FLIR/COCO by nc")
    p.add_argument("--model", type=str, default="m",
                   choices=["n", "s", "m", "l", "x"])
    p.add_argument("--first_out", type=int, default=None)
    p.add_argument("--image_size", type=int, default=640)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--iou", type=float, default=0.45)
    p.add_argument("--bs", type=int, default=128,
                   help="device batch (128 = measured single-chip optimum)")
    p.add_argument("--max_wait_ms", type=float, default=5.0,
                   help="max batching delay after the first queued request")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=5005)
    p.add_argument("--no_fuse", action="store_true",
                   help="keep live BatchNorm (debugging only)")
    p.add_argument("--no_overlap", action="store_true",
                   help="disable depth-1 batch pipelining (debugging only)")
    p.add_argument("--dp", type=int, default=0,
                   help="serve the batch data-parallel over N devices "
                        "(0 = single device); --bs must be a multiple of "
                        "N; use bs = 128 * N")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel factor: shard conv channels over N "
                        "devices (composes with --dp on a (data, model) "
                        "mesh; for family variants too large for one chip)")
    p.add_argument("--anchors", type=str, default=None,
                   help="anchors.json from an --autoanchor run")
    return p.parse_args()


def main(opt):
    import jax.numpy as jnp
    import numpy as np

    from yolov5m_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()

    from yolov5m_tpu.cli.detect import load_variables
    from yolov5m_tpu.config import COCO_LABELS, FLIR_LABELS, Config
    from yolov5m_tpu.models import YOLOv5
    from yolov5m_tpu.models.yolo import FAMILY, normalized_anchors
    from yolov5m_tpu.serving import DetectionServer

    labels = (opt.labels.split(",") if opt.labels
              else FLIR_LABELS if opt.nc == 2 else COCO_LABELS)
    fam_fo, fam_dm = FAMILY[opt.model]
    first_out = opt.first_out if opt.first_out is not None else fam_fo
    cfg = Config(first_out=first_out, nc=opt.nc, image_size=opt.image_size)
    model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16,
                   depth_mult=fam_dm)
    variables = load_variables(opt, model, jnp)
    if not opt.no_fuse:
        from yolov5m_tpu.models.fuse import fold_batchnorm
        variables = fold_batchnorm(variables)
        model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16,
                       fused=True, depth_mult=fam_dm)
    if opt.anchors:
        import json
        with open(opt.anchors) as f:
            anchors = normalized_anchors(
                anchors=np.asarray(json.load(f), np.float32))
    else:
        anchors = normalized_anchors()

    dp_mesh, tp_mesh = None, None
    n_tp = getattr(opt, "tp", 1)
    if n_tp > 1:
        from yolov5m_tpu.parallel import make_tp_mesh
        n_data = getattr(opt, "dp", 0) or 1
        tp_mesh = make_tp_mesh(n_data=n_data, n_model=n_tp)
        print(f"==> tensor-parallel serving over a {n_data}x{n_tp} "
              "(data, model) mesh")
    elif getattr(opt, "dp", 0) and opt.dp > 1:
        from yolov5m_tpu.parallel import make_mesh
        dp_mesh = make_mesh(opt.dp)
        print(f"==> data-parallel serving over {opt.dp} devices")
    server = DetectionServer(
        model, variables, anchors, labels=labels,
        image_size=opt.image_size, conf_threshold=opt.conf,
        iou_threshold=opt.iou, max_detections=cfg.max_detections,
        batch_size=opt.bs, max_wait_ms=opt.max_wait_ms,
        overlap=not opt.no_overlap, dp_mesh=dp_mesh, tp_mesh=tp_mesh,
        host=opt.host, port=opt.port)
    print(f"==> compiling bs={opt.bs} pipeline ...", flush=True)
    server.start()
    print(f"==> serving on {opt.host}:{server.port} "
          f"(bs={opt.bs}, conf={opt.conf}, iou={opt.iou})", flush=True)
    try:
        import threading
        threading.Event().wait()  # serve until interrupted
    except KeyboardInterrupt:
        pass
    finally:
        server.stop()


def cli():
    """Console-script entry point (pyproject.toml [project.scripts])."""
    main(arg_parser())


if __name__ == "__main__":
    main(arg_parser())
