"""On-device synthetic structured data (yolov5m_tpu/data/synthetic.py):
label/image consistency, determinism, palette distinctness — plus a
round-trip check of the committed flagship bench weights when present.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov5m_tpu.data.synthetic import class_palette, synth_batch

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WEIGHTS = os.path.join(_REPO, "weights", "flagship_synth_bf16.msgpack")


def test_palette_distinct_across_classes():
    for nc in (3, 80):
        p = class_palette(nc)
        assert p.shape == (nc, 3)
        assert p.min() >= 0.14 and p.max() <= 0.96
        # channel 0 alone separates all classes (coprime multiplier)
        assert len(np.unique(p[:, 0])) == nc


def test_synth_batch_shapes_and_label_consistency():
    bs, hw, nc, mb = 4, 128, 80, 8
    img, labels, mask = jax.jit(
        lambda k: synth_batch(k, bs, hw, nc, mb))(jax.random.PRNGKey(7))
    img, labels, mask = map(np.asarray, (img, labels, mask))
    assert img.shape == (bs, hw, hw, 3)
    assert labels.shape == (bs, mb, 5) and mask.shape == (bs, mb)
    assert img.min() >= 0.0 and img.max() <= 1.0
    assert mask.sum(axis=1).min() >= 1          # every image has a box

    valid = labels[mask]
    cls, cx, cy, w, h = valid.T
    assert ((cls >= 0) & (cls < nc)).all()
    assert (w >= 0.05).all() and (w <= 0.43).all()
    # boxes fully inside the image
    assert (cx - w / 2 >= -1e-6).all() and (cx + w / 2 <= 1 + 1e-6).all()
    assert (cy - h / 2 >= -1e-6).all() and (cy + h / 2 <= 1 + 1e-6).all()
    # padded rows are zeroed
    assert (labels[~mask] == 0).all()

    # the LAST valid box per image is painted last (never occluded):
    # its center pixel must be exactly the class color
    palette = class_palette(nc)
    for b in range(bs):
        k = int(mask[b].sum()) - 1
        c, x, y, _, _ = labels[b, k]
        px = img[b, int(y * hw), int(x * hw)]
        np.testing.assert_allclose(px, palette[int(c)], atol=1e-6)


def test_synth_batch_deterministic_and_key_sensitive():
    f = jax.jit(lambda k: synth_batch(k, 2, 64, 10))
    a1 = jax.tree.map(np.asarray, f(jax.random.PRNGKey(3)))
    a2 = jax.tree.map(np.asarray, f(jax.random.PRNGKey(3)))
    b = jax.tree.map(np.asarray, f(jax.random.PRNGKey(4)))
    for x, y in zip(jax.tree.leaves(a1), jax.tree.leaves(a2)):
        np.testing.assert_array_equal(x, y)
    assert not np.allclose(a1[0], b[0])


@pytest.mark.skipif(not os.path.isfile(WEIGHTS),
                    reason="committed flagship weights not present")
def test_flagship_weights_restore_fold_apply():
    """The committed bench weights restore without a template, fold, and
    drive a flagship forward whose logits are finite and non-degenerate."""
    from flax import serialization

    from yolov5m_tpu.config import Config
    from yolov5m_tpu.models import YOLOv5
    from yolov5m_tpu.models.fuse import fold_batchnorm

    with open(WEIGHTS, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    assert set(raw) == {"params", "batch_stats"}
    raw = jax.tree.map(lambda x: np.asarray(x, np.float32), raw)
    fused_vars = fold_batchnorm(raw)

    cfg = Config()
    model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16,
                   fused=True)
    img, _, _ = synth_batch(jax.random.PRNGKey(0), 1, 64, cfg.nc)
    preds = model.apply(fused_vars, img, train=False)
    assert len(preds) == 3
    for p in preds:
        arr = np.asarray(p, np.float32)
        assert np.isfinite(arr).all()
    # a trained objectness head is not all-below-threshold noise: spread
    # between background and peak obj logits must be material
    obj = np.concatenate([np.asarray(p, np.float32)[..., 4].ravel()
                          for p in preds])
    assert obj.max() - obj.min() > 2.0
