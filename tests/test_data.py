"""Data pipeline tests on a synthetic on-disk dataset."""

import os

import numpy as np
import pytest
from PIL import Image

from yolov5m_tpu.data.augment import TrainAugment
from yolov5m_tpu.data.dataset import BatchLoader, DetectionDataset, load_label_file
from yolov5m_tpu.data.native import letterbox, native_available, resize_bilinear


@pytest.fixture
def tiny_dataset(tmp_path, rng):
    """12 images with random sizes + coco-format txt labels."""
    for split in ("train", "val"):
        os.makedirs(tmp_path / "images" / split)
        os.makedirs(tmp_path / "labels" / split)
        n = 8 if split == "train" else 4
        for i in range(n):
            w = int(rng.integers(80, 320))
            h = int(rng.integers(80, 320))
            img = rng.integers(0, 255, (h, w, 3), np.uint8)
            Image.fromarray(img).save(tmp_path / "images" / split / f"img{i}.jpg")
            lines = []
            for _ in range(int(rng.integers(0, 5))):
                bw = rng.uniform(5, w / 2)
                bh = rng.uniform(5, h / 2)
                x1 = rng.uniform(0, w - bw)
                y1 = rng.uniform(0, h - bh)
                cls = int(rng.integers(1, 81))  # coco classes are 1-indexed
                lines.append(f"{x1:.2f} {y1:.2f} {bw:.2f} {bh:.2f} {cls}")
            (tmp_path / "labels" / split / f"img{i}.txt").write_text("\n".join(lines))
    return str(tmp_path)


def test_label_loading_coco_format(tmp_path):
    p = tmp_path / "l.txt"
    p.write_text("10 20 100 50 3\n-1 5 10 10 2\n")  # second row dropped (negative)
    labels = load_label_file(str(p), "coco", w0=640, h0=640)
    assert labels.shape == (1, 5)
    assert labels[0, 0] == 2  # 0-indexed class
    np.testing.assert_allclose(
        labels[0, 1:], [60 / 640, 45 / 640,
                        np.floor(100 / 640 * 1000) / 1000,
                        np.floor(50 / 640 * 1000) / 1000], atol=1e-3)


def test_label_loading_empty(tmp_path):
    p = tmp_path / "e.txt"
    p.write_text("")
    assert load_label_file(str(p), "coco", 640, 640).shape == (0, 5)


def test_annotation_csv_cached(tiny_dataset):
    ds1 = DetectionDataset(tiny_dataset, train=True)
    csv = os.path.join(tiny_dataset, "labels", "annot_train.csv")
    assert os.path.isfile(csv)
    ds2 = DetectionDataset(tiny_dataset, train=True)  # loads from cache
    assert len(ds1) == len(ds2) == 8
    assert sorted(a[0] for a in ds1.annotations) == sorted(a[0] for a in ds2.annotations)


def test_rect_buckets_all_shaped(tiny_dataset):
    """Every bucket gets a stride-32 shape — the reference's iloc[i:bs] bug
    (dataset.py:188-189) left all but the first bucket unshaped."""
    ds = DetectionDataset(tiny_dataset, train=True, rect_training=True, bs=4)
    for name, h, w in ds.annotations:
        assert h % 32 == 0 and w % 32 == 0, (name, h, w)
        assert h >= 32 and w >= 32


def test_batch_loader_fixed_shapes(tiny_dataset):
    ds = DetectionDataset(tiny_dataset, train=True, max_boxes=16)
    loader = BatchLoader(ds, batch_size=4, shuffle=True)
    batches = list(loader)
    assert len(batches) == 2
    for b in batches:
        assert b["image"].shape == (4, 640, 640, 3)
        assert b["labels"].shape == (4, 16, 5)
        assert b["mask"].shape == (4, 16)
        assert b["image"].dtype == np.float32
        assert 0.0 <= b["image"].min() and b["image"].max() <= 1.0
        # masked labels normalized
        assert np.all(b["labels"][b["mask"]][:, 1:] <= 1.0)
        assert np.all(b["labels"][~b["mask"]] == 0)


def test_batch_loader_emits_original_sizes(tiny_dataset):
    """Batches carry orig_hw = pre-resize source-image sizes (eval rescales
    boxes/areas back to source coordinates for COCO-comparable area buckets),
    including under rect training where annotation rows are overwritten with
    planned batch shapes."""
    for rect in (False, True):
        ds = DetectionDataset(tiny_dataset, train=False, rect_training=rect,
                              bs=2, max_boxes=16)
        loader = BatchLoader(ds, batch_size=2)
        by_name = dict(ds.orig_sizes)
        seen = 0
        for b in loader:
            assert b["orig_hw"].shape == (2, 2)
            for k in range(2):
                if not b["image_valid"][k]:
                    continue
                seen += 1
                assert tuple(b["orig_hw"][k]) in by_name.values()
        assert seen == 4
        # orig sizes are the real file sizes, not the planned shapes
        for name, (h, w) in by_name.items():
            from PIL import Image as _Image
            with _Image.open(os.path.join(tiny_dataset, "images", "val",
                                          name)) as im:
                assert (im.size[1], im.size[0]) == (h, w)


def test_batch_loader_rect_batches_share_shape(tiny_dataset):
    ds = DetectionDataset(tiny_dataset, train=False, rect_training=True, bs=2)
    loader = BatchLoader(ds, batch_size=2)
    for b in loader:
        assert b["image"].shape[1] % 32 == 0 and b["image"].shape[2] % 32 == 0


def test_native_resize_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    img = rng.integers(0, 255, (97, 123, 3), np.uint8)
    got = resize_bilinear(img, (64, 48))
    exp = cv2.resize(img, (64, 48), interpolation=cv2.INTER_LINEAR)
    assert got.shape == exp.shape
    # implementations may differ by a rounding ULP
    assert np.abs(got.astype(int) - exp.astype(int)).max() <= 1


def test_numpy_resize_fallback_handles_grayscale(rng, monkeypatch):
    """The pure-numpy bilinear (last link of the native→cv2→numpy fallback
    chain) must handle 2-D images — letterbox documents (h, w) support —
    including non-square targets, where a broadcasting bug once raised."""
    import yolov5m_tpu.data.native as native

    import sys

    monkeypatch.setattr(native, "_load_lib", lambda: None)
    monkeypatch.setitem(sys.modules, "cv2", None)   # import cv2 → ImportError
    img2d = rng.integers(0, 255, (97, 123), np.uint8)
    got = native.resize_bilinear(img2d, (64, 48))
    assert got.shape == (48, 64)
    img3d = np.repeat(img2d[..., None], 3, axis=-1)
    got3d = native.resize_bilinear(img3d, (64, 48))
    np.testing.assert_array_equal(got, got3d[..., 0])


def test_letterbox_geometry(rng):
    img = rng.integers(0, 255, (100, 200, 3), np.uint8)
    out, ratio, (dw, dh) = letterbox(img, (128, 128))
    assert out.shape == (128, 128, 3)
    assert ratio[0] == pytest.approx(128 / 200)
    # top/bottom bands are fill color
    assert np.all(out[0] == 114) and np.all(out[-1] == 114)


def test_augment_hflip_box_math():
    aug = TrainAugment(seed=1, color_jitter_p=0, hflip_p=1.0, vflip_p=0,
                       rotate_p=0, blur_p=0, clahe_p=0, posterize_p=0,
                       channel_shuffle_p=0, transpose_batch_parity=False)
    img = np.zeros((64, 64, 3), np.float32)
    labels = np.array([[0, 0.25, 0.5, 0.1, 0.2]], np.float32)
    _, out = aug(img, labels, batch_idx=1)
    np.testing.assert_allclose(out[0], [0, 0.75, 0.5, 0.1, 0.2], atol=1e-6)


def test_augment_transpose_batch_parity():
    aug = TrainAugment(seed=1, color_jitter_p=0, hflip_p=0, vflip_p=0,
                       rotate_p=0, blur_p=0, clahe_p=0, posterize_p=0,
                       channel_shuffle_p=0, transpose_batch_parity=True)
    img = np.arange(64 * 64 * 3, dtype=np.float32).reshape(64, 64, 3)
    labels = np.array([[2, 0.25, 0.75, 0.1, 0.2]], np.float32)
    out_img, out = aug(img.copy(), labels.copy(), batch_idx=0)  # even → transpose
    np.testing.assert_allclose(out[0], [2, 0.75, 0.25, 0.2, 0.1], atol=1e-6)
    np.testing.assert_allclose(out_img, img.transpose(1, 0, 2))
    out_img2, out2 = aug(img.copy(), labels.copy(), batch_idx=1)  # odd → no-op
    np.testing.assert_allclose(out2, labels, atol=1e-6)
    np.testing.assert_allclose(out_img2, img)


def test_augment_preserves_empty_labels():
    aug = TrainAugment(seed=0)
    img = np.zeros((64, 64, 3), np.float32)
    out_img, out = aug(img, np.zeros((0, 5), np.float32), batch_idx=0)
    assert out.shape == (0, 5)
    assert out_img.shape == img.shape


def test_native_library_builds():
    # informational: native path should build in this image (g++ present)
    assert native_available(), "native preprocess library failed to build"


def test_prefetch_loader_matches_sync(tiny_dataset):
    """Prefetching loader yields identical batches to the synchronous path."""
    from yolov5m_tpu.data.augment import TrainAugment
    ds = DetectionDataset(tiny_dataset, train=True, max_boxes=16)
    sync = BatchLoader(ds, batch_size=4, shuffle=True, seed=5,
                       augment=TrainAugment(seed=1))
    pref = BatchLoader(ds, batch_size=4, shuffle=True, seed=5,
                       augment=TrainAugment(seed=1), num_workers=4)
    for a, b in zip(sync, pref):
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["labels"], b["labels"])
        np.testing.assert_array_equal(a["mask"], b["mask"])


def test_mosaic4_box_placement():
    """Mosaic quadrant geometry: a full-image box in each source lands in the
    right quadrant with correct normalized coordinates."""
    from yolov5m_tpu.data.augment import mosaic4
    s = 64
    items = []
    for c in range(4):
        img = np.full((s, s, 3), 50.0 * (c + 1), np.float32)
        labels = np.array([[c, 0.5, 0.5, 0.5, 0.5]], np.float32)
        items.append((img, labels))
    rng = np.random.default_rng(0)
    img, labels = mosaic4(items, s, rng)
    assert img.shape == (s, s, 3)
    # all four boxes survive (each at least partially visible)
    assert 1 <= len(labels) <= 4
    assert np.all(labels[:, 1:] >= 0) and np.all(labels[:, 1:] <= 1)
    # classes are from the source set
    assert set(labels[:, 0].astype(int)) <= {0, 1, 2, 3}


def test_hsv_augment_preserves_shape_and_range(rng):
    from yolov5m_tpu.data.augment import augment_hsv
    img = rng.uniform(0, 255, (32, 32, 3)).astype(np.float32)
    out = augment_hsv(img, rng)
    assert out.shape == img.shape
    assert 0 <= out.min() and out.max() <= 255


def test_mosaic_loader_integration(tiny_dataset):
    ds = DetectionDataset(tiny_dataset, train=True, max_boxes=32)
    loader = BatchLoader(ds, batch_size=4, shuffle=True, seed=1,
                         mosaic_p=1.0, hsv=True)
    b = next(iter(loader))
    assert b["image"].shape == (4, 640, 640, 3)
    assert np.all(b["labels"][b["mask"]][:, 1:] <= 1.0)


def test_epoch_rerandomizes_multiscale_sizes(tiny_dataset):
    """The multi-scale size schedule must differ between epochs (reference
    draws a fresh size per batch, utils/training_utils.py:11-28); each batch
    stays internally scale-consistent (normalized labels are size-invariant)."""
    ds = DetectionDataset(tiny_dataset, train=True, max_boxes=16)
    buckets = (320, 352, 384, 416, 448, 480, 512, 544, 576, 608, 640)
    loader = BatchLoader(ds, batch_size=1, shuffle=False,
                         size_buckets=buckets)

    def sizes_for_epoch(e):
        loader.set_epoch(e)
        out = []
        for b in loader:
            assert b["image"].shape[1] == b["image"].shape[2]
            assert b["image"].shape[1] % 32 == 0
            assert np.all(b["labels"][b["mask"]][:, 1:] <= 1.0)
            out.append(b["image"].shape[1])
        return out

    seq0 = sizes_for_epoch(0)
    seq0_again = sizes_for_epoch(0)
    seq1 = sizes_for_epoch(1)
    assert seq0 == seq0_again            # deterministic within an epoch
    assert seq0 != seq1                  # re-randomized across epochs


def test_epoch_rerandomizes_augmentation(tiny_dataset):
    """Per-item augmentation draws must differ across epochs even with
    shuffle off (rect training forces shuffle off — without epoch folding
    every epoch repeated identical flips/rotations/mosaics)."""
    ds = DetectionDataset(tiny_dataset, train=True, max_boxes=16)
    loader = BatchLoader(ds, batch_size=4, shuffle=False,
                         augment=TrainAugment(seed=1), mosaic_p=0.5, hsv=True)

    def first_batch(e):
        loader.set_epoch(e)
        return next(iter(loader))

    b0 = first_batch(0)
    b0_again = first_batch(0)
    b1 = first_batch(1)
    np.testing.assert_array_equal(b0["image"], b0_again["image"])
    assert not np.array_equal(b0["image"], b1["image"])


def test_epoch_rerandomizes_shuffle_order(tiny_dataset):
    ds = DetectionDataset(tiny_dataset, train=True, max_boxes=16)
    loader = BatchLoader(ds, batch_size=8, shuffle=True)

    def batch_labels(e):
        loader.set_epoch(e)
        return next(iter(loader))["labels"]

    l0, l0b, l1 = batch_labels(0), batch_labels(0), batch_labels(1)
    np.testing.assert_array_equal(l0, l0b)
    assert not np.array_equal(l0, l1)


def test_unletterbox_roundtrip_within_1px(rng):
    """A box at a known original-image location survives
    letterbox -> (letterbox-space coords) -> unletterbox within 1 px
    (VERDICT round-1 item #7; reference rescale contract at
    utils/bboxes_utils.py:116-126)."""
    import numpy as np
    from yolov5m_tpu.ops.boxes import unletterbox_boxes

    h0, w0 = 480, 720
    img = rng.integers(0, 255, (h0, w0, 3), np.uint8)
    box_orig = np.array([100.0, 50.0, 400.0, 300.0])  # xyxy in source pixels

    out, ratio, (dw, dh) = letterbox(img, (640, 640))
    r = ratio[0]
    box_lb = np.array([box_orig[0] * r + dw, box_orig[1] * r + dh,
                       box_orig[2] * r + dw, box_orig[3] * r + dh])

    back = np.asarray(unletterbox_boxes(box_lb, ratio, (dw, dh), (h0, w0)))
    np.testing.assert_allclose(back, box_orig, atol=1.0)

    # clipping: a box poking past the original image clamps to its bounds
    poke = np.array([-5.0 * r + dw, -5.0 * r + dh,
                     (w0 + 9) * r + dw, (h0 + 9) * r + dh])
    clipped = np.asarray(unletterbox_boxes(poke, ratio, (dw, dh), (h0, w0)))
    np.testing.assert_allclose(clipped, [0, 0, w0, h0], atol=1e-4)


def test_epoch_auto_advances_without_set_epoch(tiny_dataset):
    """Iterating the loader repeatedly WITHOUT set_epoch must still give
    fresh shuffle/augmentation per pass (pre-round-2 stateful-rng contract);
    set_epoch switches to explicit, reproducible numbering."""
    ds = DetectionDataset(tiny_dataset, train=True, max_boxes=16)
    loader = BatchLoader(ds, batch_size=8, shuffle=True,
                         augment=TrainAugment(seed=1))
    a = next(iter(loader))
    b = next(iter(loader))
    assert not np.array_equal(a["image"], b["image"])   # fresh per pass
    loader.set_epoch(5)
    c = next(iter(loader))
    d = next(iter(loader))
    np.testing.assert_array_equal(c["image"], d["image"])  # pinned epoch
