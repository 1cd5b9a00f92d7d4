"""On-device photometric + geometric train augmentations (XLA).

Extends the on-device preprocessing story (north-star: augmentation runs as
on-device XLA preprocessing) beyond mosaic (ops/mosaic.py) to the two
augmentations the host pipeline applies per item on every step:

  * HSV gain jitter — semantics of data/augment.py augment_hsv (the
    Ultralytics hyp.scratch recipe the reference's albumentations
    ColorJitter approximates, reference config.py:40-53): per-image gains
    r = U(-1,1) * [hgain, sgain, vgain] + 1, hue remapped as
    (H_cv2 * r_h) mod 180 in OpenCV's 0..180 hue scale, S and V scaled and
    clipped. The host path quantizes through uint8 LUTs; this path is the
    same transform in float, so the two agree to uint8 rounding
    (parity-tested in tests/test_augment_device.py).
  * Horizontal/vertical flips — per-image Bernoulli, label cx/cy mirrored
    (exact parity with data/augment.py TrainAugment's corner math:
    cx' = 1 - cx is identical to the corner-swap round trip).

Everything is elementwise + reverses on fixed shapes: it jits into one
device program per image shape (the train CLI folds it into the same
dispatch as device mosaic — eager composition would cost ~11 relay
dispatches/step, CLAUDE.md).

Host-only augmentations (rotate, blur, CLAHE, posterize, channel shuffle,
batch-parity transpose) stay in data/augment.py: they are low-probability
cv2 ops whose cost is amortized across loader threads, not per-step work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from yolov5m_tpu.data.augment import MIN_VISIBILITY
from yolov5m_tpu.ops.mosaic import FILL, random_mosaic_batch

# Ultralytics hyp.scratch defaults (data/augment.py augment_hsv)
HGAIN, SGAIN, VGAIN = 0.015, 0.7, 0.4


def rgb_to_hsv(img: jnp.ndarray):
    """RGB [0,1] → (h_deg [0,360), s [0,1], v [0,1]) per pixel.

    Same piecewise hue as OpenCV (which the host path uses through uint8);
    value scale does not matter for H and S, so [0,1] inputs are fine.
    """
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    c = v - mn
    safe_c = jnp.where(c > 0, c, 1.0)
    h = jnp.where(
        c <= 0, 0.0,
        jnp.where(v == r, ((g - b) / safe_c) % 6.0,
                  jnp.where(v == g, (b - r) / safe_c + 2.0,
                            (r - g) / safe_c + 4.0)))
    s = jnp.where(v > 0, c / jnp.where(v > 0, v, 1.0), 0.0)
    return h * 60.0, s, v


def hsv_to_rgb(h_deg: jnp.ndarray, s: jnp.ndarray, v: jnp.ndarray):
    """Inverse of rgb_to_hsv, vectorized sector select."""
    h6 = (h_deg / 60.0) % 6.0
    i = jnp.floor(h6)
    f = h6 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32)
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [v, q, p, p, t], v)
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [t, v, v, q, p], p)
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, v, v], q)
    return jnp.stack([r, g, b], axis=-1)


def hsv_jitter(img: jnp.ndarray, gains: jnp.ndarray) -> jnp.ndarray:
    """Apply (r_h, r_s, r_v) gains to one image, host-augment_hsv semantics:
    hue in OpenCV 0..180 units is scaled then wrapped mod 180; S and V are
    scaled and clipped. img float [0,1]."""
    h_deg, s, v = rgb_to_hsv(img)
    h_cv = h_deg * 0.5                       # OpenCV uint8 hue scale (0..180)
    h_cv = (h_cv * gains[0]) % 180.0
    s = jnp.clip(s * gains[1], 0.0, 1.0)
    v = jnp.clip(v * gains[2], 0.0, 1.0)
    return hsv_to_rgb(h_cv * 2.0, s, v).astype(img.dtype)


def hsv_batch(key, images: jnp.ndarray,
              hgain: float = HGAIN, sgain: float = SGAIN,
              vgain: float = VGAIN) -> jnp.ndarray:
    """Per-image random HSV gains over a (B, H, W, 3) [0,1] batch."""
    b = images.shape[0]
    u = jax.random.uniform(key, (b, 3), minval=-1.0, maxval=1.0)
    gains = u * jnp.asarray([hgain, sgain, vgain]) + 1.0
    return jax.vmap(hsv_jitter)(images, gains)


def flip_batch(key, images, labels, mask,
               hflip_p: float = 0.5, vflip_p: float = 0.5):
    """Per-image Bernoulli horizontal/vertical flips.

    labels: (B, nb, 5) normalized (cls, cx, cy, w, h); padded rows (mask
    False) are left untouched. Exact parity with the host TrainAugment
    corner math: mirroring corners and re-centering reduces to cx' = 1-cx
    (cy' = 1-cy), w/h unchanged.
    """
    kh, kv = jax.random.split(key)
    b = images.shape[0]
    do_h = jax.random.uniform(kh, (b,)) < hflip_p
    do_v = jax.random.uniform(kv, (b,)) < vflip_p

    imgs = jnp.where(do_h[:, None, None, None], images[:, :, ::-1], images)
    imgs = jnp.where(do_v[:, None, None, None], imgs[:, ::-1], imgs)

    cx = jnp.where(do_h[:, None], 1.0 - labels[..., 1], labels[..., 1])
    cy = jnp.where(do_v[:, None], 1.0 - labels[..., 2], labels[..., 2])
    new = jnp.stack([labels[..., 0], cx, cy,
                     labels[..., 3], labels[..., 4]], axis=-1)
    return imgs, jnp.where(mask[..., None], new, labels), mask


@functools.partial(jax.jit, static_argnames=(
    "mosaic_p", "hsv", "hflip_p", "vflip_p", "hgain", "sgain", "vgain",
    "min_visibility", "fill"))
def device_augment_batch(key, images, labels, mask, *,
                         mosaic_p: float = 0.0, hsv: bool = True,
                         hflip_p: float = 0.5, vflip_p: float = 0.5,
                         hgain: float = HGAIN, sgain: float = SGAIN,
                         vgain: float = VGAIN,
                         min_visibility: float = MIN_VISIBILITY,
                         fill: float = FILL):
    """Full on-device augmentation step: mosaic → HSV → flips, one program.

    images (B, s, s, 3) float [0,1]; labels (B, nb, 5); mask (B, nb).
    All probabilities/gains are trace-time constants (one jit cache entry
    per configuration + image shape).
    """
    k_m, k_h, k_f = jax.random.split(key, 3)
    if mosaic_p > 0.0:
        images, labels, mask = random_mosaic_batch(
            k_m, images, labels, mask, p=mosaic_p,
            min_visibility=min_visibility, fill=fill)
    if hsv:
        images = hsv_batch(k_h, images, hgain, sgain, vgain)
    if hflip_p > 0.0 or vflip_p > 0.0:
        images, labels, mask = flip_batch(k_f, images, labels, mask,
                                          hflip_p, vflip_p)
    return images, labels, mask
