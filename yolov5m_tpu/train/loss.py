"""YOLOv5 detection loss — fully on-device, fixed-shape, jit/grad friendly.

Two interchangeable implementations, mirroring the reference's two losses:

  * kind="custom"      — grid-target loss (reference loss.py:20-246, the
                         default): Aladdin-style best-anchor-per-scale
                         assignment, GIoU box loss, IoU-weighted objectness
                         BCE with per-scale balance, one-hot class BCE.
  * kind="ultralytics" — candidate-matching loss (reference
                         ultralytics_loss.py:17-311, `--ultralytics_loss`):
                         anchor-ratio filter + neighbor-cell expansion.

Both consume padded (bs, max_boxes, 5) label tensors + mask — target building
runs vectorized on device (see train/targets.py), eliminating the reference's
per-image CPU loop (loss.py:70).

Known fix vs the reference (documented, intentional): cells marked "ignore"
(obj target -1) are *excluded* from the objectness BCE. The reference feeds
-1 straight into BCEWithLogitsLoss (loss.py:217-220), which makes the loss
unbounded below (log σ − 2·log(1−σ) → −∞) — masking is the intended
semantics of ignore.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from yolov5m_tpu.config import Config
from yolov5m_tpu.ops.boxes import box_iou
from yolov5m_tpu.train.targets import (
    build_flat_targets, build_grid_targets, build_sparse_grid_targets)

BALANCE = (4.0, 1.0, 0.4)  # per-scale obj weighting, reference loss.py:36


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Scale-invariant lambda weights (reference loss.py:32-34)."""

    nc: int = 80
    nl: int = 3
    image_size: int = 640
    anchor_t: float = 4.0
    ignore_iou_thresh: float = 0.5
    iou_type: str = "giou"   # giou (reference) | ciou | diou | iou
    # Ultralytics-recipe extras (reference uses neither):
    label_smoothing: float = 0.0   # cls BCE targets become 1-e/2 and e/2
    focal_gamma: float = 0.0       # focal modulation of cls/obj BCE (0 = off)

    @property
    def cls_pos(self) -> float:
        return 1.0 - 0.5 * self.label_smoothing

    @property
    def cls_neg(self) -> float:
        return 0.5 * self.label_smoothing

    @property
    def lambda_class(self) -> float:
        return 0.5 * (self.nc / 80 * 3 / self.nl)

    @property
    def lambda_obj(self) -> float:
        return 1.0 * ((self.image_size / 640) ** 2 * 3 / self.nl)

    @property
    def lambda_box(self) -> float:
        return 0.05 * (3 / self.nl)

    @classmethod
    def from_config(cls, cfg: Config) -> "LossConfig":
        return cls(nc=cfg.nc, image_size=cfg.image_size,
                   anchor_t=cfg.anchor_t,
                   ignore_iou_thresh=cfg.ignore_iou_thresh,
                   iou_type=cfg.iou_type,
                   label_smoothing=cfg.label_smoothing,
                   focal_gamma=cfg.focal_gamma)


def bce_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross entropy with logits (numerically stable)."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def focal_bce_logits(logits: jnp.ndarray, labels: jnp.ndarray,
                     gamma: float, alpha: float = 0.25) -> jnp.ndarray:
    """Focal loss on BCE-with-logits (Ultralytics FocalLoss semantics:
    modulating factor (1-p_t)^gamma and alpha balancing applied to the
    elementwise BCE). gamma=0 reduces to alpha-weighted BCE."""
    bce = bce_logits(logits, labels)
    p = jax.nn.sigmoid(logits)
    p_t = labels * p + (1.0 - labels) * (1.0 - p)
    alpha_t = labels * alpha + (1.0 - labels) * (1.0 - alpha)
    return bce * alpha_t * (1.0 - p_t) ** gamma


def _sum_count(x: jnp.ndarray, mask: jnp.ndarray):
    """Masked-mean NUMERATOR and DENOMINATOR, unreduced across devices.

    Every loss part is a masked mean num/den; keeping the two separate is
    what lets data-parallel callers reproduce the single-device global-batch
    mean exactly — per-shard means do not commute with psum when counts
    differ. parallel/dp.py psums num and den inside the step (YoloLoss.
    axis_name); parallel/pp.py carries them OUT of shard_map and composes
    there (its check_vma=False AD rule forbids internal psums on the
    differentiated path)."""
    m = mask.astype(x.dtype)
    return jnp.sum(x * m), jnp.sum(m)


def _stack_parts(box, obj, cls):
    """[(num, den)] per scale -> ({"box","obj","cls"}: (nl,)) nums, dens."""
    parts = {"box": box, "obj": obj, "cls": cls}
    nums = {k: jnp.stack([n for n, _ in v]) for k, v in parts.items()}
    dens = {k: jnp.stack([d for _, d in v]) for k, v in parts.items()}
    return nums, dens


class YoloLoss:
    """Callable loss. Static config captured at construction; __call__ is a
    pure function of (preds, labels, mask) so it jits and differentiates.
    """

    def __init__(self, lc: LossConfig, anchors_px, kind: str = "custom",
                 strides: Sequence[int] = (8, 16, 32),
                 axis_name: Optional[str] = None):
        assert kind in ("custom", "ultralytics")
        self.lc = lc
        self.anchors_px = jnp.asarray(anchors_px, jnp.float32)  # (nl, na, 2)
        self.kind = kind
        self.strides = tuple(strides)
        # mesh axis for data-parallel GLOBAL loss (see parallel/dp.py): when
        # set, every reduction spans the whole global batch and the returned
        # loss equals the single-device loss on that batch.
        self.axis_name = axis_name

    def with_axis(self, axis_name: Optional[str]) -> "YoloLoss":
        return YoloLoss(self.lc, self.anchors_px, self.kind, self.strides,
                        axis_name)

    def _bce(self, logits, labels):
        """cls/obj BCE, optionally focal (LossConfig.focal_gamma)."""
        if self.lc.focal_gamma > 0:
            return focal_bce_logits(logits, labels, self.lc.focal_gamma)
        return bce_logits(logits, labels)

    def _smooth_one_hot(self, cls_idx):
        """One-hot cls targets with optional label smoothing
        (positives 1-e/2, negatives e/2 — Ultralytics smooth_BCE)."""
        lc = self.lc
        oh = jax.nn.one_hot(cls_idx, lc.nc)
        if lc.label_smoothing > 0:
            oh = oh * (lc.cls_pos - lc.cls_neg) + lc.cls_neg
        return oh

    def _box_iou(self, pbox, tbox):
        t = self.lc.iou_type
        return box_iou(pbox, tbox, giou=(t == "giou"), diou=(t == "diou"),
                       ciou=(t == "ciou"))[..., 0]

    def __call__(self, preds: Sequence[jnp.ndarray], labels: jnp.ndarray,
                 label_mask: jnp.ndarray) -> Tuple[jnp.ndarray, dict]:
        """preds: list of (bs, na, ny, nx, 5+nc) raw logits.
        labels: (bs, nb, 5) (class, x, y, w, h) normalized; label_mask: (bs, nb).
        Returns (total_loss, {"box","obj","cls"}) — total scaled by bs like
        reference loss.py:236 / ultralytics_loss.py:120.
        """
        nums, dens = self.num_den(preds, labels, label_mask)
        bs = preds[0].shape[0]
        if self.axis_name is not None:
            # data-parallel GLOBAL loss: psum numerators and denominators
            # separately (see _sum_count), then compose — equals the
            # single-device loss on the full global batch
            bs = bs * jax.lax.axis_size(self.axis_name)
            nums = jax.tree.map(
                lambda x: jax.lax.psum(x, self.axis_name), nums)
            dens = jax.tree.map(
                lambda x: jax.lax.psum(x, self.axis_name), dens)
        return self.compose(nums, dens, bs)

    def num_den(self, preds: Sequence[jnp.ndarray], labels: jnp.ndarray,
                label_mask: jnp.ndarray) -> Tuple[dict, dict]:
        """Raw per-scale masked-mean numerators/denominators of every loss
        part, unreduced across devices: two {"box", "obj", "cls"} dicts of
        (nl,) f32 arrays. `compose(nums, dens, bs)` turns them into the
        (total, parts) of __call__; summing num/den across data shards
        first yields the exact global-batch loss (see _sum_count)."""
        if self.kind == "custom":
            return self._custom_num_den(preds, labels, label_mask)
        return self._ultralytics_num_den(preds, labels, label_mask)

    def compose(self, nums: dict, dens: dict, bs) -> Tuple[jnp.ndarray, dict]:
        """(total, parts) from num_den output; bs is the GLOBAL batch size
        the reference scales the total by (loss.py:236)."""
        lc = self.lc
        bal = jnp.asarray(BALANCE, jnp.float32)
        lbox = jnp.sum(nums["box"] / jnp.maximum(dens["box"], 1.0))
        lobj = jnp.sum(nums["obj"] / jnp.maximum(dens["obj"], 1.0) * bal)
        lcls = jnp.sum(nums["cls"] / jnp.maximum(dens["cls"], 1.0))
        total = (lc.lambda_box * lbox + lc.lambda_obj * lobj
                 + lc.lambda_class * lcls) * bs
        return total, {"box": lc.lambda_box * lbox,
                       "obj": lc.lambda_obj * lobj,
                       "cls": lc.lambda_class * lcls}

    # ---------------- custom (grid targets) ----------------

    def _custom_num_den(self, preds, labels, label_mask):
        lc = self.lc
        grid_sizes = [(p.shape[2], p.shape[3]) for p in preds]
        per_scale = build_sparse_grid_targets(
            labels, label_mask, self.anchors_px, grid_sizes,
            lc.ignore_iou_thresh)
        box, obj, cls = [], [], []
        for s, (p, m) in enumerate(zip(preds, per_scale)):
            anchors = self.anchors_px[s] / float(self.strides[s])  # cell units
            valid = m["valid"]
            # gather first, cast the gathered rows + obj channel only —
            # casting the whole (bs,na,ny,nx,5+nc) tensor to fp32 doubles
            # its HBM traffic for data that is mostly never read again
            rows = p[m["b"], m["a"], m["gj"], m["gi"]].astype(jnp.float32)

            pxy = jax.nn.sigmoid(rows[..., 0:2]) * 2.0 - 0.5
            pwh = (jax.nn.sigmoid(rows[..., 2:4]) * 2.0) ** 2 * anchors[m["a"]]
            pbox = jnp.concatenate([pxy, pwh], axis=-1)
            iou = self._box_iou(pbox, m["tbox"])               # (bs*nb,)
            box.append(_sum_count(1.0 - iou, valid))

            # objectness over the full grid: positives weighted by detached
            # clamped IoU (reference loss.py:217-220), scattered back at the
            # winning cells; ignore cells masked out (see module doc)
            iou_d = jnp.clip(jax.lax.stop_gradient(iou), 0.0)
            tobj = jnp.zeros(p.shape[:4], jnp.float32)
            tobj = tobj.at[m["b"], m["a"], m["gj"], m["gi"]].max(
                jnp.where(valid, iou_d, 0.0))
            obj_bce = self._bce(p[..., 4].astype(jnp.float32), tobj)
            obj.append(_sum_count(obj_bce, ~m["ign"]))

            tcls = self._smooth_one_hot(m["tcls"])
            cls_bce = self._bce(rows[..., 5:], tcls)           # (bs*nb, nc)
            cls.append(_sum_count(
                cls_bce, valid[:, None] & jnp.ones_like(cls_bce, jnp.bool_)))

        return _stack_parts(box, obj, cls)

    # ---------------- ultralytics (flat candidates) ----------------

    def _ultralytics_num_den(self, preds, labels, label_mask):
        lc = self.lc
        grid_sizes = [(p.shape[2], p.shape[3]) for p in preds]
        per_scale = build_flat_targets(labels, label_mask, self.anchors_px,
                                       grid_sizes, lc.anchor_t, self.strides)
        box, obj, cls = [], [], []
        for p, m in zip(preds, per_scale):
            valid = m["valid"]
            rows = p[m["b"], m["a"], m["gj"], m["gi"]].astype(jnp.float32)

            pxy = jax.nn.sigmoid(rows[..., 0:2]) * 2.0 - 0.5
            pwh = (jax.nn.sigmoid(rows[..., 2:4]) * 2.0) ** 2 * m["anchor_wh"]
            pbox = jnp.concatenate([pxy, pwh], axis=-1)
            iou = self._box_iou(pbox, m["tbox"])               # (M,)
            box.append(_sum_count(1.0 - iou, valid))

            # scatter detached IoU into the obj target grid; overlapping
            # matches resolve by max (reference's last-write order at
            # ultralytics_loss.py:89 is nondeterministic anyway)
            iou_d = jnp.clip(jax.lax.stop_gradient(iou), 0.0)
            tobj = jnp.zeros(p.shape[:4], jnp.float32)
            tobj = tobj.at[m["b"], m["a"], m["gj"], m["gi"]].max(
                jnp.where(valid, iou_d, 0.0))
            obj_bce = self._bce(p[..., 4].astype(jnp.float32), tobj)
            # plain (unmasked) mean over the full grid — ultralytics_loss.py
            # has no ignore cells, so the denominator is the grid size
            obj.append(_sum_count(obj_bce, jnp.ones_like(obj_bce, bool)))

            if lc.nc > 1:
                tcls = self._smooth_one_hot(m["tcls"])
                cls_bce = self._bce(rows[..., 5:], tcls)
                cls.append(_sum_count(
                    cls_bce,
                    valid[:, None] & jnp.ones_like(cls_bce, jnp.bool_)))
            else:
                cls.append((jnp.zeros((), jnp.float32),
                            jnp.zeros((), jnp.float32)))

        return _stack_parts(box, obj, cls)
