"""SyntheticLoader contract: the BatchLoader-shaped on-device stream that
backs `--data synth` (cli/train.py) and the flagship orchestration cycle.

Pins the properties the orchestration relies on:
  * val stream is a FIXED eval set — identical across epochs (else mAP
    curves and post-resume evals are incomparable);
  * train stream differs across epochs and steps (it is the data);
  * multi-scale sizes cycle deterministically with the largest size first
    (first compile = peak-memory program);
  * batch dict shape/type contract (device image, numpy labels/mask,
    normalized in-bounds boxes).
"""

import numpy as np

import jax

from yolov5m_tpu.data.synthetic import SyntheticLoader


def _fetch(batch):
    return (np.asarray(jax.device_get(batch["image"])),
            np.asarray(batch["labels"]), np.asarray(batch["mask"]))


def test_val_set_is_fixed_across_epochs():
    loader = SyntheticLoader(2, steps=3, image_size=96, nc=4, train=False)
    loader.set_epoch(1)
    a = [_fetch(b) for b in loader]
    loader.set_epoch(2)
    b = [_fetch(b) for b in loader]
    for (ia, la, ma), (ib, lb, mb) in zip(a, b):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(la, lb)
        np.testing.assert_array_equal(ma, mb)


def test_train_stream_varies_by_epoch_and_step():
    loader = SyntheticLoader(2, steps=2, image_size=96, nc=4, train=True)
    loader.set_epoch(1)
    e1 = [_fetch(b) for b in loader]
    loader.set_epoch(2)
    e2 = [_fetch(b) for b in loader]
    assert not np.array_equal(e1[0][0], e2[0][0])   # across epochs
    assert not np.array_equal(e1[0][0], e1[1][0])   # across steps


def test_multiscale_cycle_largest_first():
    loader = SyntheticLoader(2, steps=4, image_size=128, nc=4,
                             multi_scale_sizes=[96, 128], train=True)
    sizes = [b["image"].shape[1] for b in loader]
    assert sizes[0] == 128, "first batch must be the peak-memory size"
    assert set(sizes) == {96, 128}, "all buckets must be exercised"
    # val ignores multi-scale: fixed shape = one eval jit
    val = SyntheticLoader(2, steps=2, image_size=128, nc=4,
                          multi_scale_sizes=[96, 128], train=False)
    assert all(b["image"].shape[1] == 128 for b in val)


def test_batch_contract():
    loader = SyntheticLoader(3, steps=1, image_size=64, nc=5, max_boxes=6)
    batch = next(iter(loader))
    assert batch["image"].shape == (3, 64, 64, 3)
    assert isinstance(batch["labels"], np.ndarray)   # host-side for matcher
    assert isinstance(batch["mask"], np.ndarray)
    assert batch["labels"].shape == (3, 6, 5)
    assert batch["mask"].shape == (3, 6)
    assert len(loader) == 1
    lab, msk = batch["labels"], batch["mask"]
    assert msk.any(), "every image has at least one box"
    cls = lab[msk][:, 0]
    assert ((cls >= 0) & (cls < 5)).all()
    cxy, wh = lab[msk][:, 1:3], lab[msk][:, 3:5]
    assert ((cxy - wh / 2 >= -1e-6) & (cxy + wh / 2 <= 1 + 1e-6)).all(), \
        "boxes must lie inside the image"
    img = np.asarray(jax.device_get(batch["image"]))
    assert img.min() >= 0.0 and img.max() <= 1.0
