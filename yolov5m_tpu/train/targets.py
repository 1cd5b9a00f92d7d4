"""Vectorized, on-device anchor-target assignment.

The reference builds grid targets with a per-image, per-box Python loop on the
CPU inside the loss (reference loss.py:70,101-192) and again in the validation
dataset (reference dataset.py:341-414) — its biggest structural inefficiency
(SURVEY.md §3.1). Here the same assignment runs as one fixed-shape scatter
graph over the whole padded batch, on device, under jit.

Assignment semantics (reference loss.py:118-191):
  * per gt box, anchors are ranked by wh-IoU; the best anchor of each scale
    claims the box's cell (the reference walks a global descending sort and
    takes the first unclaimed anchor per scale — the first anchor of a scale
    in that order is exactly the scale's argmax);
  * non-best anchors with wh-IoU > ignore_thresh mark their cell "ignore"
    (obj = -1) unless the cell is claimed;
  * cell/anchor conflicts between boxes: first box in label order wins
    (reference's `anchor_taken` check). We reproduce this deterministically
    with a scatter-min tournament on the box index instead of sequential
    state.

Intentional deviation #3 (documented, not a bug): in the reference, a box
that finds its scale's best anchor-cell already claimed falls through to the
scale's NEXT-best anchor at the same cell (the descending global anchor walk
with `anchor_taken`, reference loss.py:159-190), with strict label-order
priority across those fallback claims. That resolution is a serial
dictatorship — each claim depends on every earlier box's outcome, including
earlier boxes' own fallbacks — so it cannot be expressed as a fixed number of
parallel tournament rounds without changing who wins in conflict chains.
Here a losing box simply gets no positive on that scale (it usually still has
positives on the other two scales). This only differs when two real boxes
share both the same cell AND the same best anchor at a scale — rare at P3/P4
granularity. The numpy goldens in tests/loss_golden.py encode these same
semantics on purpose (deviations #1/#2 are noted there), so parity tests
validate the implementation against the *intended* spec, not the reference's
sequential fallback.

Grid target channels: (x_cell, y_cell, w_cell, h_cell, obj, class), matching
reference dataset.py:393-409.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from yolov5m_tpu.ops.boxes import iou_wh


def anchor_iou_all(wh: jnp.ndarray, anchors_px: jnp.ndarray) -> jnp.ndarray:
    """wh-IoU of each box against all anchors.

    Args:
      wh: (..., 2) normalized box sizes (fraction of image).
      anchors_px: (nl, na, 2) anchors in pixels at the canonical 640 scale.
    Returns:
      (..., nl, na) IoU (matches reference iou_width_height usage at
      loss.py:120, where normalized anchors are rescaled by stride — i.e.
      compared in units of the 640-normalized image).
    """
    anchors_n = anchors_px.reshape(-1, 2) / 640.0  # (nl*na, 2) normalized
    iou = iou_wh(wh[..., None, :], anchors_n)      # (..., nl*na)
    return iou.reshape(*wh.shape[:-1], anchors_px.shape[0], anchors_px.shape[1])


def _winner_grid(label_mask: jnp.ndarray, a_best: jnp.ndarray,
                 i: jnp.ndarray, j: jnp.ndarray,
                 na: int, ny: int, nx: int) -> jnp.ndarray:
    """Scatter-min claim tournament: first valid box per (anchor, cell) wins.

    The TPU-native replacement for the reference's sequential `anchor_taken`
    loop (reference loss.py:155-175): every box scatters its own index into
    its (a_best, i, j) cell with a min-combiner, so the lowest box index —
    the reference's first-come-first-served order — wins without any
    sequential dependency. Returns (bs, na, ny, nx) int32 of winning box
    ids, `nb` where no box claimed the cell. Shared by the dense
    (build_grid_targets, eval path) and sparse (build_sparse_grid_targets,
    loss hot path) builders so the assignment semantics cannot drift.
    """
    bs, nb = label_mask.shape
    box_ids = jnp.broadcast_to(jnp.arange(nb)[None, :], (bs, nb))
    claim = jnp.where(label_mask, box_ids, nb)            # padded boxes lose
    winner = jnp.full((bs, na, ny, nx), nb, jnp.int32)
    return winner.at[
        jnp.arange(bs)[:, None], a_best, i, j
    ].min(claim.astype(jnp.int32))


def _ignore_grid(iou_s: jnp.ndarray, a_best: jnp.ndarray,
                 label_mask: jnp.ndarray, i: jnp.ndarray, j: jnp.ndarray,
                 na: int, ny: int, nx: int,
                 ignore_iou_thresh: float) -> jnp.ndarray:
    """(bs, na, ny, nx) bool: cells to EXCLUDE from the objectness loss —
    any non-best anchor of this scale with IoU > thresh at the box's cell
    (reference loss.py:189's -1 marks). Shared by both grid builders."""
    bs, nb = label_mask.shape
    is_best = jax.nn.one_hot(a_best, na, dtype=jnp.bool_)
    ignore_cand = (iou_s > ignore_iou_thresh) & ~is_best & label_mask[..., None]
    anchor_ids = jnp.broadcast_to(jnp.arange(na)[None, None, :], (bs, nb, na))
    ign = jnp.zeros((bs, na, ny, nx), jnp.bool_)
    return ign.at[
        jnp.arange(bs)[:, None, None],
        anchor_ids,
        jnp.broadcast_to(i[..., None], (bs, nb, na)),
        jnp.broadcast_to(j[..., None], (bs, nb, na)),
    ].max(ignore_cand)


def build_grid_targets(
    labels: jnp.ndarray,
    label_mask: jnp.ndarray,
    anchors_px: jnp.ndarray,
    grid_sizes: Sequence[Tuple[int, int]],
    ignore_iou_thresh: float = 0.5,
) -> List[jnp.ndarray]:
    """Build per-scale grid targets for a padded label batch.

    Args:
      labels: (bs, nb, 5) rows (class, x, y, w, h), normalized coords.
      label_mask: (bs, nb) bool — True for real boxes.
      anchors_px: (nl, na, 2) anchor priors in pixels (640-scale).
      grid_sizes: [(ny, nx)] * nl (static).
    Returns:
      list of nl tensors (bs, na, ny, nx, 6): (x_c, y_c, w_c, h_c, obj, cls),
      obj ∈ {1 (positive), 0 (background), -1 (ignore)}.
    """
    bs, nb, _ = labels.shape
    nl, na, _ = anchors_px.shape

    cls = labels[..., 0]
    xy = labels[..., 1:3]
    wh = labels[..., 3:5]

    iou = anchor_iou_all(wh, anchors_px)                  # (bs, nb, nl, na)
    best_anchor = jnp.argmax(iou, axis=-1)                # (bs, nb, nl)

    targets = []
    for s, (ny, nx) in enumerate(grid_sizes):
        gx = xy[..., 0] * nx                              # (bs, nb)
        gy = xy[..., 1] * ny
        j = jnp.clip(gx.astype(jnp.int32), 0, nx - 1)
        i = jnp.clip(gy.astype(jnp.int32), 0, ny - 1)

        a_best = best_anchor[..., s]                      # (bs, nb)

        # positive assignment: first valid box per (a, i, j) wins
        winner = _winner_grid(label_mask, a_best, i, j, na, ny, nx)

        has_pos = winner < nb
        w_idx = jnp.where(has_pos, winner, 0)
        batch_ix = jnp.arange(bs)[:, None, None, None]
        take = lambda v: v[batch_ix, w_idx]  # (bs,nb) → (bs,na,ny,nx)  # noqa: E731

        tx = take(gx) - take(j).astype(jnp.float32)       # x within cell
        ty = take(gy) - take(i).astype(jnp.float32)
        tw = take(wh[..., 0] * nx)
        th = take(wh[..., 1] * ny)
        tc = take(cls)

        # ignore marks: any anchor of this scale with iou > thresh that
        # is not the box's best anchor for the scale (reference loss.py:189)
        ign = _ignore_grid(iou[..., s, :], a_best, label_mask, i, j,
                           na, ny, nx, ignore_iou_thresh)

        obj = jnp.where(has_pos, 1.0, jnp.where(ign, -1.0, 0.0))
        tgt = jnp.stack([tx, ty, tw, th, obj, tc], axis=-1)
        tgt = jnp.where(has_pos[..., None],
                        tgt,
                        jnp.concatenate([jnp.zeros_like(tgt[..., :4]),
                                         obj[..., None],
                                         jnp.zeros_like(tgt[..., 5:])], axis=-1))
        targets.append(tgt)

    return targets


def build_sparse_grid_targets(
    labels: jnp.ndarray,
    label_mask: jnp.ndarray,
    anchors_px: jnp.ndarray,
    grid_sizes: Sequence[Tuple[int, int]],
    ignore_iou_thresh: float = 0.5,
) -> List[dict]:
    """Sparse form of build_grid_targets for the loss hot path.

    Same assignment semantics, but positives come back as fixed-capacity
    per-box rows (each box claims at most one cell per scale) instead of a
    dense (bs, na, ny, nx, 6) grid — so the loss computes GIoU/class-BCE on
    (bs*nb) rows, not on every grid cell (a ~2.5x train-loss speedup at 640²).

    Returns per-scale dicts:
      b, a, gj, gi: (bs*nb,) int32 — batch/anchor/cell indices
      tbox: (bs*nb, 4) — (x_cell, y_cell, w_cells, h_cells)
      tcls: (bs*nb,) int32
      valid: (bs*nb,) bool — box is real AND won its (a, i, j) cell
      ign: (bs, na, ny, nx) bool — ignore cells (non-best anchor IoU > thresh,
           no positive present)
    """
    bs, nb, _ = labels.shape
    nl, na, _ = anchors_px.shape

    cls = labels[..., 0]
    xy = labels[..., 1:3]
    wh = labels[..., 3:5]

    iou = anchor_iou_all(wh, anchors_px)                  # (bs, nb, nl, na)
    best_anchor = jnp.argmax(iou, axis=-1)                # (bs, nb, nl)

    out = []
    for s, (ny, nx) in enumerate(grid_sizes):
        gx = xy[..., 0] * nx
        gy = xy[..., 1] * ny
        j = jnp.clip(gx.astype(jnp.int32), 0, nx - 1)     # (bs, nb)
        i = jnp.clip(gy.astype(jnp.int32), 0, ny - 1)
        a_best = best_anchor[..., s]

        winner = _winner_grid(label_mask, a_best, i, j, na, ny, nx)
        box_ids = jnp.broadcast_to(jnp.arange(nb)[None, :], (bs, nb))
        won = winner[jnp.arange(bs)[:, None], a_best, i, j] == box_ids
        valid = label_mask & won

        tbox = jnp.stack([gx - j.astype(jnp.float32),
                          gy - i.astype(jnp.float32),
                          wh[..., 0] * nx,
                          wh[..., 1] * ny], axis=-1)      # (bs, nb, 4)

        has_pos = winner < nb
        ign = _ignore_grid(iou[..., s, :], a_best, label_mask, i, j,
                           na, ny, nx, ignore_iou_thresh)
        ign = ign & ~has_pos

        n_flat = bs * nb
        out.append({
            "b": jnp.broadcast_to(jnp.arange(bs)[:, None], (bs, nb)).reshape(n_flat),
            "a": a_best.reshape(n_flat).astype(jnp.int32),
            "gj": i.reshape(n_flat),
            "gi": j.reshape(n_flat),
            "tbox": tbox.reshape(n_flat, 4),
            "tcls": cls.reshape(n_flat).astype(jnp.int32),
            "valid": valid.reshape(n_flat),
            "ign": ign,
        })
    return out


def build_flat_targets(
    labels: jnp.ndarray,
    label_mask: jnp.ndarray,
    anchors_px: jnp.ndarray,
    grid_sizes: Sequence[Tuple[int, int]],
    anchor_t: float = 4.0,
    strides: Sequence[int] = (8, 16, 32),
) -> List[dict]:
    """Ultralytics-style candidate matching, fixed-shape (reference
    ultralytics_loss.py:122-311).

    Per scale: replicate each (box, anchor) pair, keep pairs whose wh ratio
    satisfies max(r, 1/r) < anchor_t, then expand each kept pair to its cell
    plus up to 2 neighbor cells (the 5-offset table at ultralytics_loss.py:151,
    conditions at :233-246).

    Returns per-scale dicts of fixed-shape arrays with a validity mask:
      b, a, gj, gi: (M,) int32 indices (M = 5*na*bs*nb)
      tbox: (M, 4) regression targets (dx, dy, w_cells, h_cells)
      tcls: (M,) int32
      anchor_wh: (M, 2) matched anchor in cell units
      valid: (M,) bool
    """
    bs, nb, _ = labels.shape
    nl, na, _ = anchors_px.shape
    g = 0.5
    # offsets: center, left(+x), up(+y), right, down — ultralytics_loss.py:151-160
    offsets = jnp.asarray(
        [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]]) * g

    cls = labels[..., 0].reshape(-1)                       # (bs*nb,)
    xy = labels[..., 1:3].reshape(-1, 2)
    wh = labels[..., 3:5].reshape(-1, 2)
    bidx = jnp.repeat(jnp.arange(bs), nb)
    vmask = label_mask.reshape(-1)

    out = []
    for s, (ny, nx) in enumerate(grid_sizes):
        gain = jnp.asarray([nx, ny], jnp.float32)
        gxy = xy * gain                                    # (N, 2) grid coords
        gwh = wh * gain                                    # cells
        # anchors in cell units: anchor_px / stride (reference model.py:156
        # stride-normalized buffer, consumed at ultralytics_loss.py:186)
        anc = anchors_px[s] / float(strides[s])

        r = gwh[:, None, :] / anc[None, :, :]              # (N, na, 2)
        ratio_ok = jnp.max(jnp.maximum(r, 1.0 / r), axis=-1) < anchor_t
        pair_ok = ratio_ok & vmask[:, None]                # (N, na)

        # neighbor-cell conditions (ultralytics_loss.py:233-246)
        jx = (gxy[:, 0] % 1.0 < g) & (gxy[:, 0] > 1.0)
        ky = (gxy[:, 1] % 1.0 < g) & (gxy[:, 1] > 1.0)
        lx = ((gain[0] - gxy[:, 0]) % 1.0 < g) & (gain[0] - gxy[:, 0] > 1.0)
        my = ((gain[1] - gxy[:, 1]) % 1.0 < g) & (gain[1] - gxy[:, 1] > 1.0)
        off_ok = jnp.stack(
            [jnp.ones_like(jx), jx, ky, lx, my], axis=0)   # (5, N)

        valid = off_ok[:, :, None] & pair_ok[None]         # (5, N, na)

        gij = (gxy[None, :, None, :] - offsets[:, None, None, :])  # (5,N,na→broadcast,2)
        gij = jnp.floor(gij).astype(jnp.int32)
        gij = jnp.broadcast_to(gij, (5, gxy.shape[0], na, 2))
        gi = jnp.clip(gij[..., 0], 0, nx - 1)
        gj = jnp.clip(gij[..., 1], 0, ny - 1)

        # dxy is relative to the CLIPPED cell: the reference's clamp_ is
        # in-place on views of gij (ultralytics_loss.py:285,296), so its
        # tbox = gxy - gij sees the clamped indices — an edge box (x_norm
        # == 1.0 → gij == nx) regresses toward cell nx-1 with dx = 1.0,
        # not toward a nonexistent cell nx with dx = 0.0.
        gij_c = jnp.stack([gi, gj], axis=-1)
        dxy = gxy[None, :, None, :] - gij_c.astype(jnp.float32)    # (5,N,na,2)
        tbox = jnp.concatenate(
            [dxy, jnp.broadcast_to(gwh[None, :, None, :], dxy.shape)], axis=-1)

        n_flat = 5 * gxy.shape[0] * na
        a_ids = jnp.broadcast_to(jnp.arange(na)[None, None, :], (5, gxy.shape[0], na))
        out.append({
            "b": jnp.broadcast_to(bidx[None, :, None], a_ids.shape).reshape(n_flat),
            "a": a_ids.reshape(n_flat),
            "gj": gj.reshape(n_flat),
            "gi": gi.reshape(n_flat),
            "tbox": tbox.reshape(n_flat, 4),
            "tcls": jnp.broadcast_to(cls[None, :, None], a_ids.shape).reshape(n_flat).astype(jnp.int32),
            "anchor_wh": jnp.broadcast_to(anc[None, None], (5, gxy.shape[0], na, 2)).reshape(n_flat, 2),
            "valid": valid.reshape(n_flat),
        })
    return out
