"""Import the ACTUAL reference implementation (/root/reference) as a test
oracle.

Unlike tests/torch_golden.py and tests/loss_golden.py (independent
re-derivations of the reference math), this module imports the reference's
own model.py / loss.py / utils/*.py and runs them — a transcription can
encode the same misreading twice; the reference itself cannot.

The environment lacks three of the reference's imports; minimal stand-ins
are installed in sys.modules ONLY when the real package is absent, and none
of them participates in the numeric paths under test except `nms`:

  * albumentations — reference config.py:40-53 builds TRAIN_TRANSFORMS at
    import time; the stub records constructor kwargs and exposes `.p` (the
    only attribute the reference reads outside augmentation execution,
    dataset.py:108-112). Never executed by the oracle tests.
  * imagesize — used only by dataset CSV building (dataset.py:66); stubbed
    with PIL. Never executed by the oracle tests.
  * torchvision — model.py imports transforms.Resize/InterpolationMode
    (used only in the neck's nearest-2x upsample, model.py:225) and
    bboxes_utils imports ops.nms. Resize is reimplemented with
    torch.nn.functional.interpolate(mode="nearest") — exact for integer 2x
    upscaling. ops.nms is reimplemented as the documented torchvision
    semantics (greedy by descending score, suppress IoU strictly greater
    than the threshold, keep-indices in score order) in pure torch.
"""

from __future__ import annotations

import functools
import sys
import types

import numpy as np

REFERENCE_DIR = "/root/reference"


def _stub_albumentations():
    A = types.ModuleType("albumentations")

    class _Transform:
        def __init__(self, *args, **kwargs):
            self.args = args
            self.kwargs = kwargs
            self.p = kwargs.get("p", 1.0)

    class Compose(_Transform):
        def __init__(self, transforms, bbox_params=None, **kwargs):
            super().__init__(**kwargs)
            self.transforms = list(transforms)

        def __getitem__(self, i):
            return self.transforms[i]

    A.Compose = Compose
    A.BboxParams = _Transform
    for name in ("ColorJitter", "Transpose", "HorizontalFlip", "VerticalFlip",
                 "Rotate", "Blur", "CLAHE", "Posterize", "ChannelShuffle",
                 "Resize", "LongestMaxSize", "PadIfNeeded", "Normalize"):
        setattr(A, name, type(name, (_Transform,), {}))
    return A


def _stub_imagesize():
    mod = types.ModuleType("imagesize")

    def get(path):
        from PIL import Image
        with Image.open(path) as im:
            return im.size  # (w, h), imagesize convention

    mod.get = get
    return mod


def _torch_greedy_nms(boxes, scores, iou_threshold):
    """torchvision.ops.nms semantics in pure torch: greedy over descending
    scores, suppress candidates with IoU STRICTLY greater than the
    threshold; returns kept indices sorted by decreasing score."""
    import torch

    order = torch.argsort(scores, descending=True, stable=True)
    boxes = boxes.to(torch.float32)
    areas = (boxes[:, 2] - boxes[:, 0]).clamp(min=0) * \
            (boxes[:, 3] - boxes[:, 1]).clamp(min=0)
    suppressed = torch.zeros(boxes.shape[0], dtype=torch.bool)
    keep = []
    for i in order.tolist():
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = torch.maximum(boxes[i, 0], boxes[:, 0])
        y1 = torch.maximum(boxes[i, 1], boxes[:, 1])
        x2 = torch.minimum(boxes[i, 2], boxes[:, 2])
        y2 = torch.minimum(boxes[i, 3], boxes[:, 3])
        inter = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
        iou = inter / (areas[i] + areas - inter).clamp(min=1e-12)
        suppressed |= iou > iou_threshold
    return torch.as_tensor(keep, dtype=torch.int64)


def _stub_torchvision():
    import torch
    import torch.nn.functional as F

    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    ops = types.ModuleType("torchvision.ops")

    class InterpolationMode:
        NEAREST = "nearest"
        BILINEAR = "bilinear"

    class Resize:
        def __init__(self, size, interpolation="nearest"):
            self.size = tuple(size)
            self.interpolation = interpolation

        def __call__(self, x):
            mode = getattr(self.interpolation, "value", self.interpolation)
            return F.interpolate(x, size=self.size, mode=str(mode))

    transforms.Resize = Resize
    transforms.InterpolationMode = InterpolationMode
    ops.nms = _torch_greedy_nms
    tv.transforms = transforms
    tv.ops = ops
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.ops"] = ops
    return tv


def _install_stubs():
    for name, maker in (("albumentations", _stub_albumentations),
                        ("imagesize", _stub_imagesize),
                        ("torchvision", _stub_torchvision)):
        if name in sys.modules:
            continue
        try:
            __import__(name)
        except ImportError:
            sys.modules[name] = maker()


@functools.lru_cache(maxsize=1)
def import_reference():
    """Import the reference's modules from /root/reference (with stubs) and
    return them as a namespace. Cached: the reference modules are stateful
    at import time (config.py builds transforms), so import once."""
    _install_stubs()
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import config as ref_config                              # noqa: F401
    import model as ref_model
    import loss as ref_loss
    import ultralytics_loss as ref_ultra
    from utils import bboxes_utils as ref_bboxes
    from utils import plot_utils as ref_plot

    ns = types.SimpleNamespace(
        config=ref_config, model=ref_model, loss=ref_loss,
        ultralytics_loss=ref_ultra,
        bboxes_utils=ref_bboxes, plot_utils=ref_plot)
    return ns


def make_reference_model(first_out=8, nc=4, seed=0):
    """Instantiate the reference YOLOV5m (model.py:178-208) in eval mode with
    deterministic random weights; returns (model, state_dict_as_numpy)."""
    import torch

    ref = import_reference()
    torch.manual_seed(seed)
    model = ref.model.YOLOV5m(
        first_out=first_out, nc=nc, anchors=ref.config.ANCHORS,
        ch=(first_out * 4, first_out * 8, first_out * 16), inference=False)
    model.eval()
    # make BN stats non-trivial so folding/parity is a real check
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    return model, sd
