"""On-device HSV/flip augmentation parity vs the host pipeline
(ops/augment_device.py vs data/augment.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov5m_tpu.data.augment import (TrainAugment, _boxes_to_corners,
                                      augment_hsv)
from yolov5m_tpu.ops.augment_device import (
    _rotate_labels, color_jitter, color_jitter_batch, device_augment_batch,
    flip_batch, hsv_batch, hsv_jitter, hsv_to_rgb, rgb_to_hsv, rotate_batch,
    rotate_image)

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def _rand_img(rng, h=32, w=48):
    return rng.uniform(0, 1, (h, w, 3)).astype(np.float32)


def _rand_labels(rng, n=6, nb=12):
    cx = rng.uniform(0.2, 0.8, n)
    cy = rng.uniform(0.2, 0.8, n)
    w = rng.uniform(0.05, 0.3, n)
    h = rng.uniform(0.05, 0.3, n)
    cls = rng.integers(0, 5, n).astype(np.float32)
    lab = np.zeros((nb, 5), np.float32)
    lab[:n] = np.stack([cls, cx, cy, w, h], 1)
    mask = np.zeros((nb,), bool)
    mask[:n] = True
    return lab, mask


def test_hsv_round_trip_identity():
    rng = np.random.default_rng(0)
    img = jnp.asarray(_rand_img(rng))
    h, s, v = rgb_to_hsv(img)
    back = hsv_to_rgb(h, s, v)
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-6)


def test_hsv_unit_gains_are_identity():
    rng = np.random.default_rng(1)
    img = jnp.asarray(_rand_img(rng))
    out = hsv_jitter(img, jnp.ones(3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


@pytest.mark.skipif(cv2 is None, reason="needs cv2 for the host oracle")
@pytest.mark.parametrize("gains", [(1.1, 1.3, 0.8), (0.9, 0.6, 1.2),
                                   (1.5, 1.0, 1.0)])
def test_hsv_parity_vs_host(gains):
    """Device float HSV == host uint8-LUT HSV up to uint8 quantization."""
    rng = np.random.default_rng(2)
    img01 = _rand_img(rng, 64, 64)
    host = augment_hsv(img01 * 255.0, rng, gains=np.asarray(gains)) / 255.0
    dev = np.asarray(hsv_jitter(jnp.asarray(img01), jnp.asarray(gains)))
    diff = np.abs(host - dev)
    # host path quantizes RGB→uint8→HSV(uint8 LUT)→RGB: each step is ≤1/255
    # plus hue-sector rounding on a handful of pixels
    assert np.mean(diff) < 2.0 / 255.0, np.mean(diff)
    assert np.quantile(diff, 0.99) < 8.0 / 255.0, np.quantile(diff, 0.99)


def test_hsv_batch_gains_differ_per_image():
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(np.stack([_rand_img(rng)] * 4))
    out = np.asarray(hsv_batch(jax.random.PRNGKey(0), imgs))
    # same source image, per-image gains → outputs differ across the batch
    assert not np.allclose(out[0], out[1])


def test_flip_parity_vs_host():
    """Forced flips match the host TrainAugment corner math exactly."""
    rng = np.random.default_rng(4)
    img = _rand_img(rng, 40, 40)
    lab, mask = _rand_labels(rng)

    for hp, vp in [(1.0, 0.0), (0.0, 1.0), (1.0, 1.0)]:
        host_aug = TrainAugment(seed=0, color_jitter_p=0, hflip_p=hp,
                                vflip_p=vp, rotate_p=0, blur_p=0, clahe_p=0,
                                posterize_p=0, channel_shuffle_p=0,
                                transpose_batch_parity=False)
        h_img, h_lab = host_aug(img.copy(), lab[mask].copy(), batch_idx=1)

        d_img, d_lab, d_mask = flip_batch(
            jax.random.PRNGKey(0), jnp.asarray(img[None]),
            jnp.asarray(lab[None]), jnp.asarray(mask[None]),
            hflip_p=hp, vflip_p=vp)
        np.testing.assert_allclose(np.asarray(d_img[0]), h_img, atol=1e-6)
        np.testing.assert_allclose(np.asarray(d_lab[0][np.asarray(d_mask[0])]),
                                   h_lab, atol=1e-6)
        # padded rows untouched
        np.testing.assert_array_equal(
            np.asarray(d_lab[0][~np.asarray(d_mask[0])]), lab[~mask])


def test_flip_probability_zero_is_identity():
    rng = np.random.default_rng(5)
    img = jnp.asarray(_rand_img(rng)[None])
    lab, mask = _rand_labels(rng)
    out_img, out_lab, _ = flip_batch(jax.random.PRNGKey(7), img,
                                     jnp.asarray(lab[None]),
                                     jnp.asarray(mask[None]), 0.0, 0.0)
    np.testing.assert_array_equal(np.asarray(out_img), np.asarray(img))
    np.testing.assert_array_equal(np.asarray(out_lab[0]), lab)


@pytest.mark.parametrize("factors", [(1.15, 0.85, 1.2), (0.8, 1.2, 0.9),
                                     (1.0, 1.0, 1.0)])
def test_color_jitter_parity_vs_host(factors):
    """Device [0,1] color jitter == host [0,255] _color_jitter / 255
    (the math is scale-invariant; only reduction order can differ)."""
    rng = np.random.default_rng(10)
    img01 = _rand_img(rng, 48, 56)
    host = TrainAugment._color_jitter(img01 * 255.0, None,
                                      factors=np.asarray(factors)) / 255.0
    dev = np.asarray(color_jitter(jnp.asarray(img01), jnp.asarray(factors)))
    np.testing.assert_allclose(dev, host, atol=2e-5)


def test_color_jitter_batch_probability_and_identity():
    rng = np.random.default_rng(11)
    imgs = jnp.asarray(np.stack([_rand_img(rng, 32, 32)] * 4))
    out0 = np.asarray(color_jitter_batch(jax.random.PRNGKey(0), imgs, p=0.0))
    np.testing.assert_array_equal(out0, np.asarray(imgs))
    out1 = np.asarray(color_jitter_batch(jax.random.PRNGKey(0), imgs, p=1.0))
    # per-image factors → same source image, different outputs
    assert not np.allclose(out1[0], out1[1])
    assert out1.min() >= 0.0 and out1.max() <= 1.0


@pytest.mark.skipif(cv2 is None, reason="needs cv2 for the host oracle")
@pytest.mark.parametrize("angle", [7.0, -19.5, 45.0])
def test_rotate_image_parity_vs_cv2(angle):
    """Device bilinear inverse warp matches cv2.warpAffine(INTER_LINEAR,
    borderValue=0) up to cv2's fixed-point coordinate quantization
    (INTER_BITS=5 → weights on a 1/32 grid)."""
    rng = np.random.default_rng(12)
    img = _rand_img(rng, 64, 80)
    m = cv2.getRotationMatrix2D((80 / 2, 64 / 2), angle, 1.0)
    host = cv2.warpAffine(img, m, (80, 64), flags=cv2.INTER_LINEAR,
                          borderValue=0)
    dev = np.asarray(rotate_image(jnp.asarray(img), jnp.float32(angle)))
    diff = np.abs(dev - host)
    assert diff.mean() < 5e-3, diff.mean()
    assert np.quantile(diff, 0.99) < 4e-2, np.quantile(diff, 0.99)


@pytest.mark.parametrize("angle", [12.0, -20.0])
def test_rotate_labels_parity_vs_host(angle):
    """Rotated-hull label math + min-visibility filter == TrainAugment
    _rotate (same formulas; dropped boxes become mask=False here)."""
    rng = np.random.default_rng(13)
    h, w = 64, 80
    img = _rand_img(rng, h, w)
    lab, mask = _rand_labels(rng)
    host_aug = TrainAugment(seed=0)
    cls = lab[mask][:, 0]
    corners = _boxes_to_corners(lab[mask])
    _, h_cls, h_corners = host_aug._rotate(img, cls, corners, angle)

    d_lab, d_mask = _rotate_labels(jnp.asarray(lab), jnp.asarray(mask),
                                   jnp.float32(angle), w, h,
                                   min_visibility=0.4)
    d_keep = np.asarray(d_mask)
    d_rows = np.asarray(d_lab)[d_keep]
    assert d_keep.sum() == len(h_cls)
    np.testing.assert_allclose(d_rows[:, 0], h_cls, atol=1e-6)
    d_corners = np.stack([d_rows[:, 1] - d_rows[:, 3] / 2,
                          d_rows[:, 2] - d_rows[:, 4] / 2,
                          d_rows[:, 1] + d_rows[:, 3] / 2,
                          d_rows[:, 2] + d_rows[:, 4] / 2], 1)
    np.testing.assert_allclose(d_corners, h_corners, atol=1e-5)


def test_rotate_batch_probability_zero_is_identity():
    rng = np.random.default_rng(14)
    img = jnp.asarray(_rand_img(rng)[None])
    lab, mask = _rand_labels(rng)
    out_img, out_lab, out_mask = rotate_batch(
        jax.random.PRNGKey(3), img, jnp.asarray(lab[None]),
        jnp.asarray(mask[None]), p=0.0)
    np.testing.assert_array_equal(np.asarray(out_img), np.asarray(img))
    np.testing.assert_array_equal(np.asarray(out_lab[0]), lab)
    np.testing.assert_array_equal(np.asarray(out_mask[0]), mask)


def test_rotate_zero_angle_is_near_identity():
    """angle=0 → the warp reduces to exact pixel-center sampling."""
    rng = np.random.default_rng(15)
    img = _rand_img(rng, 40, 40)
    out = np.asarray(rotate_image(jnp.asarray(img), jnp.float32(0.0)))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_device_augment_batch_jits_and_keeps_shapes():
    rng = np.random.default_rng(6)
    b, s, nb = 4, 64, 12
    imgs = jnp.asarray(rng.uniform(0, 1, (b, s, s, 3)).astype(np.float32))
    labs = np.zeros((b, nb, 5), np.float32)
    masks = np.zeros((b, nb), bool)
    for i in range(b):
        labs[i], masks[i] = _rand_labels(rng, n=3, nb=nb)
    out_i, out_l, out_m = device_augment_batch(
        jax.random.PRNGKey(0), imgs, jnp.asarray(labs), jnp.asarray(masks),
        mosaic_p=0.5, hsv=True, hflip_p=0.5, vflip_p=0.5, cj_p=0.4,
        rotate_p=0.7)
    assert out_i.shape == imgs.shape
    assert out_l.shape == (b, nb, 5)
    assert out_m.shape == (b, nb)
    out = np.asarray(out_i)
    assert np.isfinite(out).all() and out.min() >= 0.0 and out.max() <= 1.0
    # surviving labels stay normalized
    lab = np.asarray(out_l)[np.asarray(out_m)]
    assert (lab[:, 1:] >= 0).all() and (lab[:, 1:] <= 1).all()
