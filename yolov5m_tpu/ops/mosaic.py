"""On-device batched mosaic-4 augmentation (north-star config: "mosaic
augmentation runs as on-device XLA preprocessing").

Semantics mirror the host implementation exactly (data/augment.py mosaic4,
which itself follows the standard YOLO recipe the reference lacks — the
reference's augmentation is host albumentations, dataset.py:106-121):

  * 2s x 2s canvas with a jittered center (yc, xc) in [s/2, 3s/2), one
    equal-size s x s image per quadrant, fill 114/255;
  * downscale 2x to s x s — cv2.INTER_LINEAR at exactly 0.5 scale reduces
    to the 2x2 box mean (src coord (i+0.5)*2-0.5 = 2i+0.5 → 0.5/0.5
    weights), so the device op is bit-faithful to the host path up to
    float rounding;
  * labels shifted into canvas space, clipped to the canvas, and filtered
    by MIN_VISIBILITY of their pre-clip area, exactly like
    augment._clip_and_filter; survivors compact into the fixed (nb, 5)
    label capacity in source order (k=0..3, then label order), like the
    loader's first-n truncation.

The quadrant placement here exploits that all four sources share the same
s x s shape, collapsing the reference-style per-quadrant case analysis to
    src_row = u - yc + (s if u < yc else 0)   (same for columns)
with out-of-range rows/cols taking the fill value.

TPU notes: no data-dependent shapes; the op jits into the train step so
mosaic runs on device between the host loader and the forward pass. The
formulation is chosen for how XLA:TPU lowers it (ROUND4_NOTES §9 has the
measured failures of the alternatives):

  * centers are quantized to even coordinates, which makes the 2x
    downscale COMMUTE with quadrant placement — all sources are halved
    once (vectorized strided-slice mean) and the mosaic is then pure
    single-pixel placement at half resolution: no (2s)² canvas exists;
  * each quadrant is a GLOBAL SHIFT of one half-res source, built with
    dynamic rolls (concat + dynamic-slice = contiguous copies) + masked
    selects under per-item lax.map — NOT an arbitrary
    ``imgs4[quad, row, col]`` gather (scalar-path bound, measured
    ~44 ms/image), and NOT vmapped rolls (vmap lowers dynamic slices to
    gathers and materializes ~15 GB of temps at bs=64);
  * wrap-around rows a roll drags in always land either in the zero-pad
    half of the padded source or outside the quadrant's validity mask,
    so they never reach the output (proof in _assemble_one).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from yolov5m_tpu.data.augment import MIN_VISIBILITY

FILL = 114.0 / 255.0


def _halve(images):
    """(..., s, s, 3) → (..., s/2, s/2, 3) by the exact 2x2 box mean.

    Strided slices, NOT reshape(s, 2, s, 2, 3).mean((1, 3)): on TPU the
    6-D reshape materializes with the size-2 dims minor, and the T(8,128)
    tiled layout pads 2 -> 128 — a 64x HBM blowup (80 GB at bs=64, 640²;
    found when the compile OOMed). Slices keep the layout and fuse."""
    return (images[..., 0::2, 0::2, :] + images[..., 0::2, 1::2, :] +
            images[..., 1::2, 0::2, :] + images[..., 1::2, 1::2, :]) * 0.25


def _assemble_one(padded, idx4, yc, xc, fill):
    """Assemble one s×s mosaic from pre-halved, pre-padded sources.

    padded: (B, s, s, 3) — each row is a HALF-RES source in the top-left
    quarter, zeros elsewhere. yc, xc: EVEN canvas center. Because the
    center is even, output pixel (i, j) equals half_k[i - dy_k/2,
    j - dx_k/2] exactly (the 2x2 canvas mean never straddles a quadrant
    or validity boundary), so no full-res canvas is ever built.

    Runs under lax.map (one item at a time): the dynamic-shift rolls
    lower to concat + dynamic_slice (contiguous copies). Under vmap they
    would lower to gathers — the scalar-path catastrophe this
    formulation exists to avoid (ROUND4_NOTES §9).

    Wrap-around proof (half-res analog of the old full-res argument):
    rolled[i] reads padded[(i - dy2) mod s]; whenever the src coord is
    outside [0, h), the wrapped index lands in the zero-pad half
    ([h, s)) — top: i - dy2 ∈ [h - yc2, h), negatives wrap to
    [s - (yc2 - h), s) ⊆ [h, s) since yc2 < s; bottom: i - dy2 ∈
    [0, s - yc2) and the invalid tail [h, s - yc2) is already pad — and
    those positions are overwritten with `fill` via the ok mask."""
    s = padded.shape[1]
    h = s // 2
    yc2, xc2 = yc // 2, xc // 2

    top_q = jnp.asarray([True, True, False, False])
    left_q = jnp.asarray([True, False, True, False])
    dy4 = jnp.where(top_q, yc - s, yc) // 2                   # (4,) even/2
    dx4 = jnp.where(left_q, xc - s, xc) // 2

    rolled = []
    for k in range(4):
        img_k = padded[idx4[k]]                               # (s, s, 3)
        rolled.append(jnp.roll(img_k, (dy4[k], dx4[k]), axis=(0, 1)))

    i2 = jax.lax.iota(jnp.int32, s)
    in_bottom = (i2[:, None] >= yc2)                          # (s, 1)
    in_right = (i2[None, :] >= xc2)                           # (1, s)
    img = jnp.where((in_bottom | in_right)[..., None],
                    jnp.where(in_bottom[..., None],
                              jnp.where(in_right[..., None],
                                        rolled[3], rolled[2]),
                              rolled[1]),
                    rolled[0])                                # (s, s, 3)
    row = i2 - yc2 + jnp.where(i2 < yc2, h, 0)
    col = i2 - xc2 + jnp.where(i2 < xc2, h, 0)
    ok = (((row >= 0) & (row < h))[:, None]
          & ((col >= 0) & (col < h))[None, :])[..., None]
    return jnp.where(ok, img, jnp.asarray(fill, img.dtype))


def _mosaic_labels(labs4, mask4, yc, xc, s, min_visibility):
    """labs4: (4, nb, 5) normalized (cls, cx, cy, w, h); mask4: (4, nb);
    yc, xc: int32 canvas center. Returns (labels (nb, 5), mask (nb,)).

    ---- labels: shift to canvas space, clip, min-visibility filter ----"""
    nb = labs4.shape[1]
    cls = labs4[..., 0]                                       # (4, nb)
    cx, cy = labs4[..., 1], labs4[..., 2]
    w, h = labs4[..., 3], labs4[..., 4]
    corners = jnp.stack([cx - w / 2, cy - h / 2,
                         cx + w / 2, cy + h / 2], axis=-1)    # (4, nb, 4)
    left = jnp.asarray([True, False, True, False])
    top = jnp.asarray([True, True, False, False])
    off_x = (jnp.where(left, xc - s, xc)).astype(jnp.float32)  # (4,)
    off_y = (jnp.where(top, yc - s, yc)).astype(jnp.float32)
    off = jnp.stack([off_x, off_y, off_x, off_y], axis=-1)[:, None, :]
    c = (corners * s + off) / (2 * s)                         # canvas-normed
    area0 = jnp.maximum(c[..., 2] - c[..., 0], 0) * \
        jnp.maximum(c[..., 3] - c[..., 1], 0)
    cc = jnp.clip(c, 0.0, 1.0)
    area = jnp.maximum(cc[..., 2] - cc[..., 0], 0) * \
        jnp.maximum(cc[..., 3] - cc[..., 1], 0)
    keep = mask4 & (area / jnp.maximum(area0, 1e-9) >= min_visibility)

    # flatten in (source k, label) order and compact to the first nb slots
    keep_f = keep.reshape(-1)
    rows = jnp.concatenate([
        cls.reshape(-1, 1),
        ((cc[..., 0] + cc[..., 2]) / 2).reshape(-1, 1),
        ((cc[..., 1] + cc[..., 3]) / 2).reshape(-1, 1),
        (cc[..., 2] - cc[..., 0]).reshape(-1, 1),
        (cc[..., 3] - cc[..., 1]).reshape(-1, 1),
    ], axis=1)                                                # (4nb, 5)
    rank = jnp.cumsum(keep_f.astype(jnp.int32)) - 1
    slot = jnp.where(keep_f & (rank < nb), rank, nb)
    out_labels = jnp.zeros((nb + 1, 5), jnp.float32).at[slot].set(rows)
    out_mask = jnp.zeros((nb + 1,), jnp.bool_).at[slot].set(keep_f)
    return out_labels[:nb], out_mask[:nb]


@functools.partial(jax.jit, static_argnames=("min_visibility", "fill"))
def mosaic_batch(images, labels, mask, idx, centers,
                 min_visibility: float = MIN_VISIBILITY, fill: float = FILL):
    """Batched mosaic: item i is built from batch rows idx[i] (4 sources).

    images: (B, s, s, 3) float in [0,1] (loader output); labels: (B, nb, 5);
    mask: (B, nb); idx: (B, 4) int32 indices into the batch; centers: (B, 2)
    int32 (yc, xc), each in [s//2, 3s//2). Centers are quantized to EVEN
    coordinates (documented deviation: a ≤1-px shift of the mosaic seam on
    the 2s canvas, i.e. ≤0.5 px after downscale — irrelevant to the
    augmentation distribution). Even centers make the 2x downscale commute
    with quadrant placement, so the whole op is: halve every source ONCE
    (vectorized strided-slice mean), then per item place four half-res
    tiles with dynamic rolls under lax.map — no (2s)² canvas, no gathers,
    bounded temps. The previous formulations measured: arbitrary-gather
    canvas 44 ms/img; full-res rolls under vmap (gather-lowered) 10 ms/img
    and 15 GB of temps at bs=64 (ROUND4_NOTES §9).
    """
    centers = centers - (centers % 2)
    half = _halve(images)                                     # (B, h, h, 3)
    s = images.shape[1]
    padded = jnp.pad(half, ((0, 0), (0, s - s // 2), (0, s - s // 2),
                            (0, 0)))                          # (B, s, s, 3)

    def one(args):
        idx4, cen = args
        img = _assemble_one(padded, idx4, cen[0], cen[1], fill)
        lab, msk = _mosaic_labels(labels[idx4], mask[idx4], cen[0], cen[1],
                                  s, min_visibility)
        return img, lab, msk

    return jax.lax.map(one, (idx, centers))


def random_mosaic_batch(key, images, labels, mask, p: float,
                        min_visibility: float = MIN_VISIBILITY,
                        fill: float = FILL):
    """Apply mosaic to each batch row with probability p; partners are drawn
    uniformly from the batch (the host loader samples dataset-wide; with a
    shuffled loader the batch IS a uniform sample, so the distributions
    match — documented deviation, data/augment.py mosaic4 samples the
    dataset). Fixed shapes: the mosaic is computed for every row and
    selected per row."""
    b, s = images.shape[0], images.shape[1]
    k1, k2, k3 = jax.random.split(key, 3)
    partners = jax.random.randint(k1, (b, 3), 0, b)
    idx = jnp.concatenate(
        [jax.lax.iota(jnp.int32, b)[:, None], partners], axis=1)
    centers = jax.random.randint(k2, (b, 2), s // 2, 3 * s // 2)
    m_img, m_lab, m_mask = mosaic_batch(images, labels, mask, idx, centers,
                                        min_visibility=min_visibility,
                                        fill=fill)
    apply = jax.random.uniform(k3, (b,)) < p
    return (jnp.where(apply[:, None, None, None], m_img, images),
            jnp.where(apply[:, None, None], m_lab, labels),
            jnp.where(apply[:, None], m_mask, mask))
