"""On-device HSV/flip augmentation parity vs the host pipeline
(ops/augment_device.py vs data/augment.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov5m_tpu.data.augment import TrainAugment, augment_hsv
from yolov5m_tpu.ops.augment_device import (
    device_augment_batch, flip_batch, hsv_batch, hsv_jitter, hsv_to_rgb,
    rgb_to_hsv)

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
        mosaic_p=0.5, hsv=True, hflip_p=0.5, vflip_p=0.5)
    assert out_i.shape == imgs.shape
    assert out_l.shape == (b, nb, 5)
    assert out_m.shape == (b, nb)
    out = np.asarray(out_i)
    assert np.isfinite(out).all() and out.min() >= 0.0 and out.max() <= 1.0
    # surviving labels stay normalized
    lab = np.asarray(out_l)[np.asarray(out_m)]
    assert (lab[:, 1:] >= 0).all() and (lab[:, 1:] <= 1).all()
