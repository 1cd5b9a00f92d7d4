"""Model export — the TPU-native equivalent of the reference's ONNX export
(reference utils/utils.py:40-53): serialize the jitted forward (and optionally
the full decode+NMS pipeline) as a portable StableHLO artifact via
jax.export, runnable by any StableHLO consumer (XLA, IREE, TF, ...).
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp


def export_stablehlo(model, variables, path: str,
                     input_shape: Tuple[int, int, int, int] = (1, 640, 640, 3),
                     with_postprocess: bool = False,
                     conf: float = 0.25, iou: float = 0.45,
                     anchors_px=None) -> str:
    """Serialize the model forward to a StableHLO artifact.

    Args:
      with_postprocess: also bake in decode + NMS (fixed-shape (bs,300,6)
        detections output).
      anchors_px: (nl, na, 2) pixel anchors to bake in (e.g. an autoanchor
        refit); default COCO anchors.
    Returns the written path.
    """
    from yolov5m_tpu.models.yolo import normalized_anchors
    from yolov5m_tpu.ops.decode import decode_predictions
    from yolov5m_tpu.ops.nms import batched_nms

    anchors = jnp.asarray(normalized_anchors(anchors=anchors_px)
                          if anchors_px is not None else normalized_anchors())

    if with_postprocess:
        def fn(image):
            preds = model.apply(variables, image, train=False)
            rows = decode_predictions(preds, anchors)
            # backend pinned to the pure-XLA fixpoint: "auto" on a TPU
            # host would pick pallas and bake a tpu_custom_call into an
            # artifact whose whole point is running on ANY StableHLO
            # consumer (IREE, CPU, GPU)
            return batched_nms(rows, iou, conf, 300, 1024, backend="xla")
    else:
        def fn(image):
            return tuple(model.apply(variables, image, train=False))

    exported = jax.export.export(jax.jit(fn))(
        jax.ShapeDtypeStruct(input_shape, jnp.float32))
    blob = exported.serialize()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_stablehlo(path: str):
    """Deserialize an exported artifact; returns a callable."""
    with open(path, "rb") as f:
        exported = jax.export.deserialize(f.read())
    return exported.call


def count_parameters(variables) -> int:
    """Trainable parameter count (reference utils/utils.py:22-23)."""
    import numpy as np
    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(variables["params"])))


def model_size_mb(variables) -> float:
    """Total variables footprint in MB (reference utils/utils.py:11-20)."""
    total = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(variables))
    return total / 1024 ** 2
