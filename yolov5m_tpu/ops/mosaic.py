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
mosaic runs on device between the host loader and the forward pass.
Because each quadrant is a GLOBAL SHIFT of one source image, the canvas
is built from four dynamic rolls (concat + dynamic-slice = contiguous
DMA-friendly copies) plus masked selects — NOT an arbitrary
``imgs4[quad, row, col]`` gather. Arbitrary gathers execute on the TPU
scalar/vector path and measured ~44 ms/image at 640² (ROUND4_NOTES §9);
the roll construction is pure bulk memory traffic. The wrap-around rows
a roll drags in always land either in the zero-pad half of the padded
source or outside the quadrant's validity mask, so they never reach the
output (proof in _mosaic_one).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from yolov5m_tpu.data.augment import MIN_VISIBILITY

FILL = 114.0 / 255.0


def _mosaic_one(imgs4, labs4, mask4, yc, xc, min_visibility, fill):
    """imgs4: (4, s, s, 3) in [0,1]; labs4: (4, nb, 5) normalized
    (cls, cx, cy, w, h); mask4: (4, nb) bool; yc, xc: int32 canvas center.
    Returns (img (s, s, 3), labels (nb, 5), mask (nb,))."""
    s = imgs4.shape[1]
    nb = labs4.shape[1]

    u = jax.lax.iota(jnp.int32, 2 * s)
    row = u - yc + jnp.where(u < yc, s, 0)
    col = u - xc + jnp.where(u < xc, s, 0)
    row_ok = (row >= 0) & (row < s)
    col_ok = (col >= 0) & (col < s)

    # Canvas via 4 dynamic rolls instead of a (2s,2s) gather (see module
    # docstring). Image k sits at canvas[u, v] = img_k[u - dy_k, v - dx_k]
    # with dy = yc - s (top) / yc (bottom), dx likewise — exactly the
    # label offsets below. Pad each source into the top-left of a
    # (2s, 2s) zero canvas and roll by (dy, dx): a canvas position whose
    # rolled index wraps past the source lands in the pad half
    # (index >= s → reads 0) precisely when its src coord is out of
    # [0, s), and those positions are overwritten by `fill` via row_ok/
    # col_ok — so wrap-around never leaks pixels.
    top_q = jnp.asarray([True, True, False, False])
    left_q = jnp.asarray([True, False, True, False])
    dy4 = jnp.where(top_q, yc - s, yc)                        # (4,)
    dx4 = jnp.where(left_q, xc - s, xc)
    padded = jnp.pad(imgs4, ((0, 0), (0, s), (0, s), (0, 0)))  # (4, 2s, 2s, 3)
    rolled = jax.vmap(
        lambda img, dy, dx: jnp.roll(img, (dy, dx), axis=(0, 1)))(
        padded, dy4, dx4)                                     # (4, 2s, 2s, 3)
    in_bottom = (u[:, None] >= yc)                            # (2s, 1)
    in_right = (u[None, :] >= xc)                             # (1, 2s)
    canvas = jnp.where((in_bottom | in_right)[..., None],
                       jnp.where(in_bottom[..., None],
                                 jnp.where(in_right[..., None],
                                           rolled[3], rolled[2]),
                                 rolled[1]),
                       rolled[0])                             # (2s, 2s, 3)
    ok = (row_ok[:, None] & col_ok[None, :])[..., None]
    canvas = jnp.where(ok, canvas, jnp.asarray(fill, canvas.dtype))
    # 2x downscale == 2x2 mean (exact INTER_LINEAR at scale 0.5).
    # Strided slices, NOT reshape(s, 2, s, 2, 3).mean((1, 3)): on TPU the
    # 6-D reshape materializes with the size-2 dims minor, and the
    # T(8,128) tiled layout pads 2 -> 128 — a 64x HBM blowup (80 GB at
    # bs=64, 640²; found when the compile OOMed). Slices keep the
    # canvas layout and fuse into the mean.
    img = (canvas[0::2, 0::2] + canvas[0::2, 1::2] +
           canvas[1::2, 0::2] + canvas[1::2, 1::2]) * 0.25

    # ---- labels: shift to canvas space, clip, min-visibility filter ----
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
    return img, out_labels[:nb], out_mask[:nb]


@functools.partial(jax.jit, static_argnames=("min_visibility", "fill"))
def mosaic_batch(images, labels, mask, idx, centers,
                 min_visibility: float = MIN_VISIBILITY, fill: float = FILL):
    """Batched mosaic: item i is built from batch rows idx[i] (4 sources).

    images: (B, s, s, 3) float in [0,1] (loader output); labels: (B, nb, 5);
    mask: (B, nb); idx: (B, 4) int32 indices into the batch; centers: (B, 2)
    int32 (yc, xc), each in [s//2, 3s//2).
    """
    imgs4 = images[idx]                                       # (B, 4, s, s, 3)
    labs4 = labels[idx]
    mask4 = mask[idx]
    f = functools.partial(_mosaic_one, min_visibility=min_visibility,
                          fill=fill)
    return jax.vmap(f)(imgs4, labs4, mask4, centers[:, 0], centers[:, 1])


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
