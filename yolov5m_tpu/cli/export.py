"""Model export CLI — ONNX (literal opset-11 artifact) and/or StableHLO.

The reference exposes ONNX export as a utility (reference utils/utils.py:40-53,
opset 11, 1x3x640x640); this CLI is the user-facing entry point for both
artifact formats:

  python -m yolov5m_tpu.cli.export --checkpoint ck.msgpack --nc 80 \
      --onnx model.onnx --stablehlo model.stablehlo --with_postprocess
"""

from __future__ import annotations

import argparse


def arg_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", type=str, default=None,
                   help="msgpack checkpoint (full TrainState or bare variables)")
    p.add_argument("--weights", type=str, default=None,
                   help="npz of torch-layout weights")
    p.add_argument("--nc", type=int, default=80)
    p.add_argument("--first_out", type=int, default=None,
                   help="width override (default: from --model)")
    p.add_argument("--model", type=str, default="m",
                   choices=["n", "s", "m", "l", "x"],
                   help="YOLOv5 family variant")
    p.add_argument("--image_size", type=int, default=640)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--onnx", type=str, default=None,
                   help="write a literal opset-11 .onnx here")
    p.add_argument("--stablehlo", type=str, default=None,
                   help="write a serialized StableHLO artifact here")
    p.add_argument("--with_postprocess", action="store_true",
                   help="StableHLO only: bake decode+NMS into the artifact")
    p.add_argument("--anchors", type=str, default=None,
                   help="anchors.json from an --autoanchor run, baked into "
                        "the postprocess export")
    return p.parse_args()


def main(opt):
    import jax.numpy as jnp

    from yolov5m_tpu.cli.detect import load_variables
    from yolov5m_tpu.models import YOLOv5
    from yolov5m_tpu.models.yolo import FAMILY

    if not (opt.onnx or opt.stablehlo):
        raise SystemExit("give --onnx and/or --stablehlo output paths")

    fam_fo, fam_dm = FAMILY[getattr(opt, "model", "m")]
    first_out = opt.first_out if opt.first_out is not None else fam_fo
    model = YOLOv5(first_out=first_out, nc=opt.nc, dtype=jnp.float32,
                   depth_mult=fam_dm)
    opt.img = None  # load_variables reuses the detect options surface
    variables = load_variables(opt, model, jnp)

    if opt.onnx:
        from yolov5m_tpu.utils.onnx_export import export_onnx
        path = export_onnx(variables, opt.onnx, nc=opt.nc,
                           first_out=first_out,
                           image_size=opt.image_size, batch=opt.batch,
                           depth_mult=fam_dm)
        print(f"wrote ONNX (opset 11): {path}")

    if opt.stablehlo:
        from yolov5m_tpu.utils.export import export_stablehlo
        anchors_px = None
        if getattr(opt, "anchors", None):
            import json

            import numpy as np
            with open(opt.anchors) as f:
                anchors_px = np.asarray(json.load(f), np.float32)
            print(f"==> baking anchors from {opt.anchors}")
        path = export_stablehlo(
            model, variables, opt.stablehlo,
            input_shape=(opt.batch, opt.image_size, opt.image_size, 3),
            with_postprocess=opt.with_postprocess, anchors_px=anchors_px)
        print(f"wrote StableHLO: {path}")


def cli():
    """Console-script entry point (pyproject.toml [project.scripts])."""
    main(arg_parser())


if __name__ == "__main__":
    main(arg_parser())
