"""Grid construction and prediction/target decoding — fixed-shape, on-device.

Reproduces the decode math of the reference (utils/plot_utils.py:10-54):

  pred path (after sigmoid):  xy = (2*sig(txy) + grid - 0.5) * stride
                              wh = (2*sig(twh))**2 * anchor * stride
  target path:                xy = (txy + grid) * stride
                              wh = twh * stride

but as a single fused jnp graph per scale (XLA fuses the sigmoid/scale
elementwise chain into the surrounding ops), emitting the reference's
(class, conf, cx, cy, w, h) row layout in one (bs, sum(3*ny*nx), 6) tensor.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def make_grid(ny: int, nx: int, dtype=jnp.float32) -> jnp.ndarray:
    """(ny, nx, 2) grid of (x, y) cell indices.

    Equivalent to reference make_grids' xy_grid (plot_utils.py:42-51) without
    the anchor broadcast (anchors are folded in by the callers).
    """
    ys = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
    return jnp.stack([xs, ys], axis=-1).astype(dtype)


def decode_layer(
    pred: jnp.ndarray,
    anchors: jnp.ndarray,
    stride: int,
) -> jnp.ndarray:
    """Decode one head output scale to (bs, 3*ny*nx, 6) rows (class, conf, cx, cy, w, h).

    Args:
      pred: (bs, na, ny, nx, 5+nc) raw logits (pre-sigmoid).
      anchors: (na, 2) stride-normalized anchors (i.e. pixels / stride).
      stride: scale stride (8/16/32).
    """
    bs, na, ny, nx, _ = pred.shape
    p = jax.nn.sigmoid(pred.astype(jnp.float32))
    grid = make_grid(ny, nx)                                  # (ny,nx,2)
    xy = (2.0 * p[..., 0:2] + grid[None, None] - 0.5) * stride
    wh = (2.0 * p[..., 2:4]) ** 2 * (anchors * stride)[None, :, None, None, :]
    obj = p[..., 4:5]
    best_class = jnp.argmax(p[..., 5:], axis=-1, keepdims=True).astype(jnp.float32)
    rows = jnp.concatenate([best_class, obj, xy, wh], axis=-1)
    return rows.reshape(bs, na * ny * nx, 6)


def decode_predictions(
    preds: Sequence[jnp.ndarray],
    anchors: jnp.ndarray,
    strides: Sequence[int] = (8, 16, 32),
) -> jnp.ndarray:
    """Decode all scales and concatenate: the pred path of reference
    cells_to_bboxes (plot_utils.py:10-40, is_pred=True).

    Args:
      preds: list of (bs, na, ny, nx, 5+nc) raw logits.
      anchors: (nl, na, 2) stride-normalized anchors.
    Returns:
      (bs, sum(na*ny*nx), 6) rows (class, conf, cx, cy, w, h) in pixels.
    """
    return jnp.concatenate(
        [decode_layer(p, anchors[i], strides[i]) for i, p in enumerate(preds)], axis=1
    )


def decode_grid_targets(
    targets: Sequence[jnp.ndarray],
    strides: Sequence[int] = (8, 16, 32),
) -> jnp.ndarray:
    """Decode grid-encoded targets back to boxes: the target path of reference
    cells_to_bboxes (plot_utils.py:29-36, is_pred=False).

    Args:
      targets: list of (bs, na, ny, nx, 6) grid tensors with channels
        (x_cell, y_cell, w_cell, h_cell, obj, class).
    Returns:
      (bs, sum(na*ny*nx), 6) rows (class, obj, cx, cy, w, h) in pixels.
    """
    outs = []
    for i, t in enumerate(targets):
        bs, na, ny, nx, _ = t.shape
        grid = make_grid(ny, nx)
        xy = (t[..., 0:2] + grid[None, None]) * strides[i]
        wh = t[..., 2:4] * strides[i]
        obj = t[..., 4:5]
        cls = t[..., 5:6]
        outs.append(jnp.concatenate([cls, obj, xy, wh], axis=-1).reshape(bs, na * ny * nx, 6))
    return jnp.concatenate(outs, axis=1)
