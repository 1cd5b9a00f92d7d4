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

  * ColorJitter — exact float semantics of data/augment.py
    TrainAugment._color_jitter (the reference's albumentations
    ColorJitter(0.2/0.2/0.2, p=.4), reference config.py:41): per-image
    brightness/contrast/saturation scale factors U(1±0.2), applied in that
    order, one clip at the end. Scale-invariant math, so [0,1] images get
    bit-for-bit the host's [0,255] result (parity-tested).
  * Rotate — semantics of TrainAugment._rotate (reference
    Rotate(limit=20, p=.7), reference config.py:49): per-image Bernoulli,
    angle U(±limit), cv2.getRotationMatrix2D/warpAffine convention
    (rotation about the (w/2, h/2) pixel point, bilinear, zero border);
    labels are the axis-aligned hull of the rotated box corners, clipped,
    with min-visibility mask-out — the host's keep-filter expressed as a
    mask update on the fixed-shape padded label array. **Available but
    NOT in the default --device_augment set**: the bilinear warp is an
    arbitrary 4-tap gather, and arbitrary gathers run on the TPU
    scalar/vector path, not the DMA engines — measured ~11x the
    elementwise dispatch floor (ROUND4_NOTES §9), which would eat a
    double-digit share of the train step, while the host pays 3.3 ms on
    ONE loader core. Use rotate_p here only on core-starved hosts.

Measured host cost (ROUND4_NOTES §3): color-jitter 6.5 ms/img amortized —
the single biggest host augment — and it is pure elementwise math, i.e.
free on device (fuses to the dispatch floor). With color jitter, HSV and
flips here, the residual host pipeline is decode + letterbox + rotate +
rare cv2 ops.

Host-only augmentations (rotate by default — see above — plus blur,
CLAHE, posterize, channel shuffle, batch-parity transpose) stay in
data/augment.py: low-probability cv2 ops amortized across loader
threads, not per-step work.
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


def color_jitter(img: jnp.ndarray, factors: jnp.ndarray) -> jnp.ndarray:
    """Brightness/contrast/saturation scales on one [0,1] image.

    Exact TrainAugment._color_jitter math: brightness scale, contrast
    about the global mean (computed AFTER brightness), saturation about
    the per-pixel gray (channel mean), single clip at the end. Every step
    is scale-invariant, so [0,1] here == host's [0,255]/255."""
    img = img * factors[0]
    mean = img.mean()
    img = (img - mean) * factors[1] + mean
    gray = img.mean(axis=-1, keepdims=True)
    img = (img - gray) * factors[2] + gray
    return jnp.clip(img, 0.0, 1.0)


def color_jitter_batch(key, images: jnp.ndarray, p: float = 0.4,
                       limit: float = 0.2) -> jnp.ndarray:
    """Per-image Bernoulli(p) color jitter with U(1±limit) factors."""
    kp, kf = jax.random.split(key)
    b = images.shape[0]
    do = jax.random.uniform(kp, (b,)) < p
    factors = jax.random.uniform(kf, (b, 3), minval=1.0 - limit,
                                 maxval=1.0 + limit)
    out = jax.vmap(color_jitter)(images, factors)
    return jnp.where(do[:, None, None, None], out, images)


def _rotation_matrix(angle_deg: jnp.ndarray, w: int, h: int):
    """cv2.getRotationMatrix2D((w/2, h/2), angle, 1.0): the 2×3 affine
    mapping SRC pixel coords → DST (positive angle = counter-clockwise in
    the y-down image frame, matching the host oracle)."""
    rad = angle_deg * (jnp.pi / 180.0)
    a, b = jnp.cos(rad), jnp.sin(rad)
    cx, cy = w / 2.0, h / 2.0
    return jnp.stack([
        jnp.stack([a, b, (1 - a) * cx - b * cy]),
        jnp.stack([-b, a, b * cx + (1 - a) * cy]),
    ])


def rotate_image(img: jnp.ndarray, angle_deg: jnp.ndarray) -> jnp.ndarray:
    """Rotate one (H, W, C) image about the (w/2, h/2) pixel point,
    bilinear, zero border — cv2.warpAffine(INTER_LINEAR, borderValue=0)
    convention: dst(x, y) = src(M⁻¹·(x, y, 1)), sampled bilinearly with
    pixel centers at integer coordinates."""
    h, w = img.shape[0], img.shape[1]
    rad = angle_deg * (jnp.pi / 180.0)
    a, b = jnp.cos(rad), jnp.sin(rad)
    cx, cy = w / 2.0, h / 2.0
    # inverse of M: A = [[a, b], [-b, a]] is orthonormal → A⁻¹ = Aᵀ;
    # src = Aᵀ·(dst − t) with t = M's translation column
    tx, ty = (1 - a) * cx - b * cy, b * cx + (1 - a) * cy
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    dx, dy = jnp.meshgrid(xs, ys)               # (H, W) dst coords
    ux, uy = dx - tx, dy - ty
    sx = a * ux - b * uy
    sy = b * ux + a * uy

    # bilinear with zero border, vectorized over channels via one gather
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        valid = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))[..., None]
        px = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(valid, px, 0.0)

    top = tap(y0i, x0i) * (1 - fx) + tap(y0i, x0i + 1) * fx
    bot = tap(y0i + 1, x0i) * (1 - fx) + tap(y0i + 1, x0i + 1) * fx
    return (top * (1 - fy) + bot * fy).astype(img.dtype)


def _rotate_labels(labels: jnp.ndarray, mask: jnp.ndarray,
                   angle_deg: jnp.ndarray, w: int, h: int,
                   min_visibility: float):
    """TrainAugment._rotate label math on one padded (nb, 5) array:
    box corners → forward affine M → axis-aligned hull → clip to [0,1] →
    keep iff clipped_area / hull_area ≥ min_visibility. Dropped rows
    become mask=False (the fixed-shape analog of the host's filter)."""
    m = _rotation_matrix(angle_deg, w, h)
    cx, cy, bw, bh = (labels[:, 1], labels[:, 2], labels[:, 3],
                      labels[:, 4])
    x1, y1 = (cx - bw / 2) * w, (cy - bh / 2) * h
    x2, y2 = (cx + bw / 2) * w, (cy + bh / 2) * h
    qx = jnp.stack([x1, x2, x2, x1], axis=1)     # (nb, 4)
    qy = jnp.stack([y1, y1, y2, y2], axis=1)
    rx = m[0, 0] * qx + m[0, 1] * qy + m[0, 2]
    ry = m[1, 0] * qx + m[1, 1] * qy + m[1, 2]
    nx1, nx2 = rx.min(axis=1) / w, rx.max(axis=1) / w
    ny1, ny2 = ry.min(axis=1) / h, ry.max(axis=1) / h
    hull_area = jnp.maximum(nx2 - nx1, 0) * jnp.maximum(ny2 - ny1, 0)
    cx1, cy1 = jnp.clip(nx1, 0.0, 1.0), jnp.clip(ny1, 0.0, 1.0)
    cx2, cy2 = jnp.clip(nx2, 0.0, 1.0), jnp.clip(ny2, 0.0, 1.0)
    clip_area = jnp.maximum(cx2 - cx1, 0) * jnp.maximum(cy2 - cy1, 0)
    keep = clip_area / jnp.maximum(hull_area, 1e-9) >= min_visibility
    new = jnp.stack([labels[:, 0], (cx1 + cx2) / 2, (cy1 + cy2) / 2,
                     cx2 - cx1, cy2 - cy1], axis=1)
    return new, mask & keep


def rotate_batch(key, images, labels, mask, p: float = 0.7,
                 limit: float = 20.0,
                 min_visibility: float = MIN_VISIBILITY):
    """Per-image Bernoulli(p) rotation by U(±limit) degrees.

    images (B, H, W, 3) [0,1]; labels (B, nb, 5) normalized; mask (B, nb).
    Boxes whose visible fraction after rotation falls below
    min_visibility are masked out (host parity: they are dropped)."""
    kp, ka = jax.random.split(key)
    b, h, w = images.shape[0], images.shape[1], images.shape[2]
    do = jax.random.uniform(kp, (b,)) < p
    angles = jax.random.uniform(ka, (b,), minval=-limit, maxval=limit)

    rot_imgs = jax.vmap(rotate_image)(images, angles)
    imgs = jnp.where(do[:, None, None, None], rot_imgs, images)

    rot_lab, rot_mask = jax.vmap(
        lambda lab, msk, ang: _rotate_labels(lab, msk, ang, w, h,
                                             min_visibility))(
        labels, mask, angles)
    new_lab = jnp.where(do[:, None, None], rot_lab, labels)
    new_mask = jnp.where(do[:, None], rot_mask, mask)
    return imgs, new_lab, new_mask


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
    "cj_p", "cj_limit", "rotate_p", "rotate_limit",
    "min_visibility", "fill"))
def device_augment_batch(key, images, labels, mask, *,
                         mosaic_p: float = 0.0, hsv: bool = True,
                         hflip_p: float = 0.5, vflip_p: float = 0.5,
                         hgain: float = HGAIN, sgain: float = SGAIN,
                         vgain: float = VGAIN,
                         cj_p: float = 0.0, cj_limit: float = 0.2,
                         rotate_p: float = 0.0,
                         rotate_limit: float = 20.0,
                         min_visibility: float = MIN_VISIBILITY,
                         fill: float = FILL):
    """Full on-device augmentation step in one program:
    mosaic → HSV → color-jitter → flips → rotate (the host pipeline's
    order — jitter before geometry, rotate last, data/augment.py:76-99).

    images (B, s, s, 3) float [0,1]; labels (B, nb, 5); mask (B, nb).
    All probabilities/gains are trace-time constants (one jit cache entry
    per configuration + image shape).
    """
    k_m, k_h, k_c, k_f, k_r = jax.random.split(key, 5)
    if mosaic_p > 0.0:
        images, labels, mask = random_mosaic_batch(
            k_m, images, labels, mask, p=mosaic_p,
            min_visibility=min_visibility, fill=fill)
    if hsv:
        images = hsv_batch(k_h, images, hgain, sgain, vgain)
    if cj_p > 0.0:
        images = color_jitter_batch(k_c, images, cj_p, cj_limit)
    if hflip_p > 0.0 or vflip_p > 0.0:
        images, labels, mask = flip_batch(k_f, images, labels, mask,
                                          hflip_p, vflip_p)
    if rotate_p > 0.0:
        images, labels, mask = rotate_batch(
            k_r, images, labels, mask, rotate_p, rotate_limit,
            min_visibility)
    return images, labels, mask
