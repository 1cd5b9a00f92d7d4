"""yolov5m_tpu — a TPU-native (JAX/XLA/Pallas/pjit) object-detection framework.

Brand-new implementation with the capabilities of the PyTorch reference
AlessandroMondin/YOLOV5m (CSP backbone + PANet neck + 3-scale anchor head,
COCO/FLIR txt-label pipeline, GIoU/obj/cls loss, NMS + mAP eval, CSV logging,
checkpoint/resume, train/detect CLIs), re-designed TPU-first:

- NHWC conv graphs compiled by XLA onto the MXU, bf16 compute.
- Fixed-shape, fully on-device postprocessing (decode + NMS) and target
  assignment (no per-image Python loops on the host).
- Data-parallel training over a `jax.sharding.Mesh` with psum gradient
  reduction over ICI (the single-device reference has no parallelism).
"""

__version__ = "0.3.0"  # single source of truth (pyproject reads it)

from yolov5m_tpu.config import Config, ANCHORS, COCO_LABELS, FLIR_LABELS

__all__ = ["Config", "ANCHORS", "COCO_LABELS", "FLIR_LABELS", "__version__"]
