"""COCO/FLIR txt-label data pipeline with fixed-shape padded batches.

Capability parity with the reference datasets (reference dataset.py:19-466):
  * directory layout {root}/images/{train,val} + {root}/labels/{split}/*.txt;
  * annotation size CSV built once and cached (dataset.py:57-72);
  * coco→yolo bbox conversion + class 0-indexing (dataset.py:98-102);
  * negative-row filtering and wh truncation floor(v*1000)/1000 (dataset.py:92-94);
  * rectangular training: ratio-sorted shape buckets cached to CSV
    (dataset.py:159-197) — with the reference's `iloc[i:bs]` slicing bug
    fixed (only its first bucket ever got a shape; see SURVEY.md §2 quirks);
  * optional albumentations-style augmentation (data/augment.py).

TPU-native redesign: batches are fixed-shape dicts
  {"image": (bs, H, W, 3) float32 /255, "labels": (bs, nb, 5), "mask": (bs, nb)}
— padded label tensors + validity mask instead of ragged per-image tuples, so
the whole train step including target assignment jits. Rect buckets produce a
small static set of (H, W) shapes, one jit cache entry each, instead of the
reference's per-batch random sizes.
"""

from __future__ import annotations

import os
import warnings
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from PIL import Image

from yolov5m_tpu.data.native import load_image_rgb, resize_bilinear


def _coco_to_yolo_np(b: np.ndarray, w0: float, h0: float) -> np.ndarray:
    """(x1,y1,w,h) absolute → (cx,cy,w,h) normalized (reference bboxes_utils.py:95-98)."""
    x1, y1, w, h = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    return np.stack([(2 * x1 + w) / (2 * w0), (2 * y1 + h) / (2 * h0),
                     w / w0, h / h0], axis=1)


def load_label_file(path: str, box_format: str, w0: float, h0: float) -> np.ndarray:
    """One txt label file → (n, 5) float32 rows (class, x, y, w, h) normalized.

    Mirrors reference dataset.py:88-102: negative-value rows dropped,
    columns 3:5 truncated to 3 decimals BEFORE the coco roll, coco classes
    0-indexed. NOTE the truncation column quirk is the reference's own: on
    coco rows (x1,y1,w,h,cls) the pre-roll columns 3:5 are (h_pixels,
    class), so the truncation is effectively a no-op there and only bites
    yolo-format (already-normalized) labels — reproduced as-is because
    goldens and converted-weight parity are built on the same bytes.
    """
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        labels = np.loadtxt(path, delimiter=" ", ndmin=2, dtype=np.float64)
    if labels.size == 0:
        return np.zeros((0, 5), np.float32)
    labels = labels[np.all(labels >= 0, axis=1)]
    if labels.shape[0] == 0:
        return np.zeros((0, 5), np.float32)
    labels[:, 3:5] = np.floor(labels[:, 3:5] * 1000) / 1000
    if box_format == "coco":
        labels[:, -1] -= 1                      # classes 1..80 → 0..79
        labels = np.roll(labels, axis=1, shift=1)  # (cls, x1, y1, w, h)
        labels[:, 1:] = _coco_to_yolo_np(labels[:, 1:], w0, h0)
    return labels.astype(np.float32)


def _read_image_size(path: str) -> Tuple[int, int]:
    """(h, w) without decoding pixel data (replaces the `imagesize` dep at
    reference dataset.py:66)."""
    with Image.open(path) as im:
        w, h = im.size
    return h, w


class DetectionDataset:
    """Index of images + labels with cached size annotations and rect buckets."""

    def __init__(
        self,
        root_directory: str,
        train: bool = True,
        rect_training: bool = False,
        default_size: int = 640,
        bs: int = 64,
        bboxes_format: str = "coco",
        max_boxes: int = 120,
    ):
        assert bboxes_format in ("coco", "yolo")
        self.root = root_directory
        self.train = train
        self.split = "train" if train else "val"
        self.rect = rect_training
        self.default_size = default_size
        self.bs = bs
        # reference dataset.py:34 uses 64/128 outright; we round down to a
        # multiple of bs so a batch can never straddle two shape buckets
        # (a straddling batch would silently squash the second bucket's
        # images to the first bucket's aspect ratio — BatchLoader sizes the
        # whole batch from its first item). Unchanged whenever bs divides
        # the reference value (16/32/64/128 — every documented recipe).
        ref_range = 64 if bs < 64 else 128
        self.batch_range = max((ref_range // bs) * bs, bs)
        self.box_format = bboxes_format
        self.max_boxes = max_boxes

        self.images_dir = os.path.join(self.root, "images", self.split)
        self.labels_dir = os.path.join(self.root, "labels", self.split)
        annot_csv = os.path.join(self.root, "labels", f"annot_{self.split}.csv")

        self.annotations = self._load_or_build_annotations(annot_csv)
        # original (pre-resize) image sizes by name — kept even under rect
        # training (which overwrites annotation rows with planned batch
        # shapes) so eval can rescale boxes/areas back to source-image
        # coordinates (COCO area buckets are defined in original pixels)
        self.orig_sizes = {name: (h, w) for name, h, w in self.annotations}
        if rect_training:
            self.annotations = self._adaptive_shape(self.annotations)

    # -------------------------------------------------- annotations

    def _load_or_build_annotations(self, csv_path: str) -> List[Tuple[str, int, int]]:
        """[(name, h, w)] — cached like reference dataset.py:57-72 (same CSV
        layout: index,name,h,w) so existing caches interoperate."""
        if os.path.isfile(csv_path):
            rows = []
            with open(csv_path) as f:
                for line in f.read().strip().splitlines()[0:]:
                    parts = line.split(",")
                    if len(parts) >= 4 and parts[1].strip():
                        try:
                            rows.append((parts[1], int(float(parts[2])), int(float(parts[3]))))
                        except ValueError:
                            continue  # header line
            if rows:
                return sorted(rows)
        rows = []
        for label_file in sorted(os.listdir(self.labels_dir)):
            if not label_file.endswith(".txt"):
                continue
            name = label_file[:-4] + ".jpg"
            img_path = os.path.join(self.images_dir, name)
            if not os.path.isfile(img_path):
                for ext in (".png", ".jpeg"):
                    alt = os.path.join(self.images_dir, label_file[:-4] + ext)
                    if os.path.isfile(alt):
                        name, img_path = label_file[:-4] + ext, alt
                        break
                else:
                    continue
            h, w = _read_image_size(img_path)
            rows.append((name, h, w))
        os.makedirs(os.path.dirname(csv_path), exist_ok=True)
        with open(csv_path, "w") as f:
            for i, (n, h, w) in enumerate(rows):
                f.write(f"{i},{n},{h},{w}\n")
        return sorted(rows)

    def _adaptive_shape(self, annotations, seed: int = 0):
        """Rect-training shape planner (reference dataset.py:159-197): sort by
        w/h ratio, bucket by batch_range, assign each bucket one stride-32
        shape (±10% jitter for train), shuffle within bucket. The reference's
        `iloc[i:bs]` bug (only bucket 0 shaped) is fixed; bucket shapes cache
        to CSV like the reference."""
        # default_size is part of the key: the planned shapes scale with it,
        # so a rerun with a different --image_size must not reuse a cache
        # planned for the old resolution
        cache = os.path.join(
            self.root, "labels",
            f"adaptive_ann_{self.split}_{len(annotations)}_br_"
            f"{self.batch_range}_sz_{self.default_size}.csv")
        if os.path.isfile(cache):
            rows = []
            with open(cache) as f:
                for line in f.read().strip().splitlines():
                    parts = line.split(",")
                    if len(parts) >= 4 and parts[1].strip():
                        try:
                            rows.append((parts[1], int(float(parts[2])), int(float(parts[3]))))
                        except ValueError:
                            continue
            if rows:
                return rows

        rng = np.random.default_rng(seed)
        ann = sorted(annotations, key=lambda r: r[2] / r[1])  # w/h ratio
        out = []
        for i in range(0, len(ann), self.batch_range):
            bucket = ann[i:i + self.batch_range]
            name0, h0, w0 = bucket[0]
            size = [float(w0), float(h0)]
            max_idx = 0 if size[0] >= size[1] else 1
            min_idx = 1 - max_idx
            size[min_idx] += 32
            if self.train:
                sz = int(rng.integers(int(self.default_size * 0.9),
                                      int(self.default_size * 1.1))) // 32 * 32
            else:
                sz = self.default_size
            size[min_idx] = (sz / size[max_idx] * size[min_idx]) // 32 * 32
            size[max_idx] = sz
            w_t, h_t = int(size[0]), int(size[1])
            shaped = [(n, max(h_t, 32), max(w_t, 32)) for n, _, _ in bucket]
            rng.shuffle(shaped)
            out.extend(shaped)

        with open(cache, "w") as f:
            for i, (n, h, w) in enumerate(out):
                f.write(f"{i},{n},{h},{w}\n")
        return out

    # -------------------------------------------------- items

    def __len__(self) -> int:
        return len(self.annotations)

    def load_item(self, idx: int, target_hw: Optional[Tuple[int, int]] = None):
        """Returns (image float32 HWC in [0,255], labels (n,5))."""
        name, h_t, w_t = self.annotations[idx]
        if target_hw is not None:
            h_t, w_t = target_hw
        elif not self.rect:
            h_t = w_t = self.default_size
        # native libjpeg decode (GIL-free; PIL fallback for other formats)
        img = load_image_rgb(os.path.join(self.images_dir, name))
        label_path = os.path.join(self.labels_dir, os.path.splitext(name)[0] + ".txt")
        labels = load_label_file(label_path, self.box_format,
                                 w0=img.shape[1], h0=img.shape[0])
        img = resize_bilinear(img, (int(w_t), int(h_t)))
        return img.astype(np.float32), labels

    def load_labels(self, idx: int) -> np.ndarray:
        """Labels only, WITHOUT decoding the image: normalization uses the
        cached original size (orig_sizes survives the rect planner's
        annotation rewrite). Label-statistics consumers (autoanchor) scan
        thousands of items — a per-item JPEG decode+resize would turn a
        sub-second label pass into minutes on a small host."""
        name, _, _ = self.annotations[idx]
        h0, w0 = self.orig_sizes[name]
        label_path = os.path.join(self.labels_dir,
                                  os.path.splitext(name)[0] + ".txt")
        return load_label_file(label_path, self.box_format, w0=w0, h0=h0)

    def item_shape(self, idx: int) -> Tuple[int, int]:
        name, h, w = self.annotations[idx]
        if not self.rect:
            return (self.default_size, self.default_size)
        return (h, w)


class BatchLoader:
    """Fixed-shape batch iterator over a DetectionDataset.

    Groups indices so every batch shares one (H, W) — for rect training the
    bucket shapes are already contiguous after _adaptive_shape (reference
    keeps order for the same reason, training_utils.py:57). Yields dicts of
    stacked numpy arrays ready for device put.
    """

    def __init__(self, dataset: DetectionDataset, batch_size: int,
                 shuffle: bool = False, augment=None, seed: int = 0,
                 drop_last: bool = False,
                 size_buckets: Optional[Sequence[int]] = None,
                 num_workers: int = 0, prefetch_depth: int = 2,
                 mosaic_p: float = 0.0, hsv: bool = False):
        """size_buckets: multi-scale training sizes. The reference resizes
        every batch to a random stride-32 size in [320, 672) (reference
        utils/training_utils.py:11-28) — unbounded dynamic shapes that would
        force an XLA recompile per novel size. Here each batch samples from a
        small static bucket set (one jit cache entry per size; SURVEY.md §7
        hard part 3). Normalized labels are scale-invariant, so only the
        image resizes. Ignored under rect training, like the reference
        (training_utils.py:99).

        drop_last: TRAINING loaders must set True — with False, a short final
        batch is padded with zero images + empty labels, marked only via the
        batch's image_valid row mask; the Evaluator honors that mask, but a
        train step has no such input, so the padding would enter the forward
        pass and pollute BatchNorm statistics and the objectness loss
        (get_loaders sets drop_last=True for the train loader; a one-time
        warning fires if a padded batch is yielded with augmentation on)."""
        self.ds = dataset
        self.bs = batch_size
        self.shuffle = shuffle and not dataset.rect
        self.augment = augment
        self.seed = seed
        self.epoch = 0
        self._epoch_explicit = False  # auto-advance per pass until set_epoch
        self._auto_epoch = 0
        self.drop_last = drop_last
        self.size_buckets = None
        if size_buckets and not dataset.rect:
            assert all(s % 32 == 0 for s in size_buckets), \
                "multi-scale sizes must be stride-32 aligned"
            self.size_buckets = tuple(size_buckets)
        # host-side parallelism: worker threads load/decode/augment items and
        # a prefetch thread builds batches ahead of the accelerator (the
        # reference's DataLoader num_workers analog, training_utils.py:59-75;
        # threads suffice — PIL decode and the native resize release the GIL)
        self.num_workers = num_workers
        self.prefetch_depth = prefetch_depth if num_workers > 0 else 0
        self._pool = None
        # mosaic + HSV (north-star config "full augmentation training":
        # mosaic + HSV/flip pipeline — neither exists in the reference)
        self.mosaic_p = mosaic_p
        self.hsv = hsv

    def __len__(self) -> int:
        n = len(self.ds)
        return n // self.bs if self.drop_last else (n + self.bs - 1) // self.bs

    def set_epoch(self, epoch: int) -> None:
        """Fold the epoch into every RNG stream (shuffle order, multi-scale
        size choice, per-item augmentation) so successive epochs see different
        randomness — the reference draws fresh sizes/augs per batch
        (reference utils/training_utils.py:11-28); without this, rect training
        (shuffle off) would repeat identical mosaics/flips/sizes every epoch.

        Optional: a loader that is simply iterated repeatedly without
        set_epoch auto-advances an internal epoch counter per pass, so plain
        `for epoch in ...: for batch in loader:` keeps fresh randomness too.
        Call set_epoch for reproducible/resumable epoch numbering."""
        self.epoch = int(epoch)
        self._epoch_explicit = True

    def __iter__(self) -> Iterator[dict]:
        if self._epoch_explicit:
            epoch = self.epoch
        else:
            epoch = self._auto_epoch
            self._auto_epoch += 1   # eager: counted per pass, not per batch
        return self._iter_epoch(epoch)

    def _iter_epoch(self, epoch: int) -> Iterator[dict]:
        order = np.arange(len(self.ds))
        if self.shuffle:
            # tuple-of-ints hash is deterministic across processes
            # (PYTHONHASHSEED only perturbs str/bytes hashing)
            np.random.default_rng(
                hash((self.seed, epoch)) & 0x7FFFFFFF).shuffle(order)
        batches = []
        for start in range(0, len(order), self.bs):
            idxs = order[start:start + self.bs]
            if len(idxs) < self.bs and self.drop_last:
                break
            batches.append((idxs, start // self.bs, epoch))

        if self.prefetch_depth <= 0:
            for args in batches:
                yield self._make_batch(*args)
            return

        # pipeline: build up to prefetch_depth batches ahead on a thread pool
        import concurrent.futures as cf
        if self._pool is None:
            self._pool = cf.ThreadPoolExecutor(max_workers=max(self.num_workers, 1))
        pending = []
        it = iter(batches)
        try:
            for _ in range(self.prefetch_depth):
                nxt = next(it, None)
                if nxt is None:
                    break
                pending.append(self._pool.submit(self._make_batch, *nxt))
            while pending:
                fut = pending.pop(0)
                nxt = next(it, None)
                if nxt is not None:
                    pending.append(self._pool.submit(self._make_batch, *nxt))
                yield fut.result()
        finally:
            for fut in pending:
                fut.cancel()

    def _make_batch(self, idxs: np.ndarray, batch_idx: int,
                    epoch: int = 0) -> dict:
        hw = self.ds.item_shape(int(idxs[0]))
        if self.size_buckets is not None:
            # deterministic per-(epoch, batch) choice (thread-safe under
            # prefetch); epoch folded in so the size schedule re-randomizes
            # every epoch like the reference's per-batch draw
            s = int(np.random.default_rng(
                hash((self.seed, epoch, batch_idx, -1)) & 0x7FFFFFFF)
                .choice(self.size_buckets))
            hw = (s, s)
        nb = self.ds.max_boxes
        # fixed batch shape: a short final batch (drop_last=False) is padded
        # with zero images + empty labels, marked invalid in image_valid so
        # the evaluator never double-counts (the old wrap-around padding fed
        # duplicated images into mAP/accuracy)
        imgs = np.zeros((self.bs, hw[0], hw[1], 3), np.float32)
        labels = np.zeros((self.bs, nb, 5), np.float32)
        mask = np.zeros((self.bs, nb), bool)
        image_valid = np.zeros(self.bs, bool)
        image_valid[:len(idxs)] = True
        # original (source-image) sizes: evaluator rescales boxes/areas back
        # to source coordinates (padded rows default to the network size =
        # identity scale; only eval consumes this — train batches may mosaic)
        orig_hw = np.tile(np.asarray(hw, np.int32), (self.bs, 1))
        for k, idx in enumerate(idxs):
            name = self.ds.annotations[int(idx)][0]
            o = self.ds.orig_sizes.get(name)
            if o is not None:
                orig_hw[k] = o
        if len(idxs) < self.bs and self.augment is not None \
                and not getattr(self, "_warned_padding", False):
            self._warned_padding = True
            import warnings
            warnings.warn(
                "BatchLoader with augmentation yielded a zero-padded short "
                "batch (drop_last=False): a train step has no image_valid "
                "input, so the blank padding enters the loss and BN stats — "
                "use drop_last=True for training loaders", stacklevel=2)
        for k, idx in enumerate(idxs):
            # per-item deterministic rng: thread-safe under prefetch
            item_rng = np.random.default_rng(
                hash((self.seed, epoch, batch_idx, k)) & 0x7FFFFFFF)
            if self.mosaic_p > 0 and item_rng.random() < self.mosaic_p \
                    and hw[0] == hw[1]:
                from yolov5m_tpu.data.augment import mosaic4
                partners = [int(idx)] + [int(i) for i in
                                         item_rng.integers(0, len(self.ds), 3)]
                items = [self.ds.load_item(i, target_hw=hw) for i in partners]
                img, lab = mosaic4(items, hw[0], item_rng)
            else:
                img, lab = self.ds.load_item(int(idx), target_hw=hw)
            if self.hsv:
                from yolov5m_tpu.data.augment import augment_hsv
                img = augment_hsv(img, item_rng)
            if self.augment is not None:
                img, lab = self.augment(img, lab, batch_idx=batch_idx,
                                        rng=item_rng)
            n = min(len(lab), nb)
            imgs[k] = img
            if n:
                labels[k, :n] = lab[:n]
                mask[k, :n] = True
        return {"image": imgs / 255.0, "labels": labels, "mask": mask,
                "image_valid": image_valid, "orig_hw": orig_hw}
