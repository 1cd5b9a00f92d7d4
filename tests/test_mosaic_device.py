"""On-device mosaic (ops/mosaic.py) parity vs the host implementation
(data/augment.py mosaic4) and integration properties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov5m_tpu.data.augment import mosaic4
from yolov5m_tpu.ops.mosaic import mosaic_batch, random_mosaic_batch

S, NB = 64, 12


def _random_items(rng, n_boxes=(3, 2, 0, 4)):
    imgs = rng.uniform(0, 255, (4, S, S, 3)).astype(np.float32)
    labs = []
    for n in n_boxes:
        lab = np.zeros((n, 5), np.float32)
        if n:
            lab[:, 0] = rng.integers(0, 4, n)
            cx, cy = rng.uniform(0.2, 0.8, (2, n))
            w, h = rng.uniform(0.05, 0.3, (2, n))
            lab[:, 1:] = np.stack([cx, cy, w, h], 1)
        labs.append(lab)
    return imgs, labs


# centers span the full sampling range [S/2, 3S/2): an interior point plus
# the extreme corners/mixed cases, where the dynamic-roll assembly's
# wrap-around indices are maximal — a modular-arithmetic bug confined to
# one boundary regime would pass an interior-only parity check
@pytest.mark.parametrize("yc,xc", [(54, 86), (32, 32), (94, 94),
                                   (32, 94), (94, 32)])
def test_device_mosaic_matches_host(rng, yc, xc):
    imgs, labs = _random_items(rng)

    host_rng = np.random.default_rng(7)
    # even centers: the device path quantizes centers to even coordinates
    # (documented deviation, ops/mosaic.py), so force the same even
    # center on the host for an exact comparison
    img_h, lab_h = mosaic4([(imgs[k], labs[k]) for k in range(4)], S,
                           host_rng, center=(yc, xc))

    labels = np.zeros((4, NB, 5), np.float32)
    mask = np.zeros((4, NB), bool)
    for k, lab in enumerate(labs):
        labels[k, :len(lab)] = lab
        mask[k, :len(lab)] = True
    idx = np.tile(np.arange(4, dtype=np.int32), (4, 1))
    centers = np.tile(np.asarray([[yc, xc]], np.int32), (4, 1))

    img_d, lab_d, mask_d = mosaic_batch(
        jnp.asarray(imgs / 255.0), jnp.asarray(labels), jnp.asarray(mask),
        jnp.asarray(idx), jnp.asarray(centers))

    # image parity: cv2's fixed-point INTER_LINEAR vs float 2x2 mean
    np.testing.assert_allclose(np.asarray(img_d[0]), img_h / 255.0,
                               atol=2.5 / 255)
    # label parity: same survivors in the same order
    got = np.asarray(lab_d[0])[np.asarray(mask_d[0])]
    assert got.shape == lab_h.shape
    np.testing.assert_allclose(got, lab_h, atol=1e-5)


def test_device_mosaic_label_capacity_and_validity(rng):
    """More survivors than nb → first-nb kept (loader truncation order);
    masked-out source labels never leak through."""
    imgs, _ = _random_items(rng)
    labels = np.zeros((4, NB, 5), np.float32)
    mask = np.zeros((4, NB), bool)
    labels[:, :, 0] = 1
    labels[:, :, 1:3] = 0.5
    labels[:, :, 3:5] = 0.2
    mask[:, :4] = True                       # 16 candidates > NB
    small_nb = 6
    idx = np.tile(np.arange(4, dtype=np.int32), (4, 1))
    centers = np.full((4, 2), S, np.int32)   # centered → nothing clipped off
    _, lab_d, mask_d = mosaic_batch(
        jnp.asarray(imgs / 255.0), jnp.asarray(labels[:, :small_nb]),
        jnp.asarray(mask[:, :small_nb]), jnp.asarray(idx),
        jnp.asarray(centers))
    assert mask_d.shape == (4, small_nb)
    assert int(mask_d[0].sum()) == small_nb  # capacity filled, no overflow
    got = np.asarray(lab_d[0])
    assert np.all(got[np.asarray(mask_d[0]), 0] == 1)


def test_device_mosaic_center_quantized_to_even(rng):
    """An odd center behaves exactly like its even floor (the documented
    ≤0.5-px seam quantization that lets the downscale commute with
    placement)."""
    imgs, labs = _random_items(rng)
    labels = np.zeros((4, NB, 5), np.float32)
    mask = np.zeros((4, NB), bool)
    for k, lab in enumerate(labs):
        labels[k, :len(lab)] = lab
        mask[k, :len(lab)] = True
    idx = np.tile(np.arange(4, dtype=np.int32), (4, 1))
    odd = np.tile(np.asarray([[55, 87]], np.int32), (4, 1))
    even = np.tile(np.asarray([[54, 86]], np.int32), (4, 1))
    a = mosaic_batch(jnp.asarray(imgs / 255.0), jnp.asarray(labels),
                     jnp.asarray(mask), jnp.asarray(idx), jnp.asarray(odd))
    b = mosaic_batch(jnp.asarray(imgs / 255.0), jnp.asarray(labels),
                     jnp.asarray(mask), jnp.asarray(idx), jnp.asarray(even))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_random_mosaic_batch_p0_and_p1(rng):
    imgs = jnp.asarray(rng.uniform(0, 1, (6, S, S, 3)).astype(np.float32))
    labels = jnp.zeros((6, NB, 5))
    mask = jnp.zeros((6, NB), bool)
    key = jax.random.PRNGKey(0)
    i0, l0, m0 = random_mosaic_batch(key, imgs, labels, mask, p=0.0)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(imgs))
    i1, _, _ = random_mosaic_batch(key, imgs, labels, mask, p=1.0)
    assert not np.allclose(np.asarray(i1), np.asarray(imgs))
    # all outputs stay in range with the fill value present
    assert float(i1.min()) >= 0.0 and float(i1.max()) <= 1.0
