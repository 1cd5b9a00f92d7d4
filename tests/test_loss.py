"""Loss parity tests: vectorized on-device implementations vs sequential
numpy goldens (the `my_loss_vs_ultra_loss.py` pattern from the reference's
verification culture, SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp

from yolov5m_tpu.config import ANCHORS
from yolov5m_tpu.train.loss import LossConfig, YoloLoss
from yolov5m_tpu.train.targets import build_grid_targets, build_flat_targets
from tests.loss_golden import (
    golden_grid_targets, golden_custom_loss, golden_ultra_loss,
)

ANCHORS_PX = np.asarray(ANCHORS, np.float32)
NC = 7


def _random_labels(rng, bs, counts, nb=20):
    """Padded labels + mask + per-image list form."""
    labels = np.zeros((bs, nb, 5), np.float32)
    mask = np.zeros((bs, nb), bool)
    per_image = []
    for b in range(bs):
        n = counts[b]
        cls = rng.integers(0, NC, n)
        xy = rng.uniform(0.1, 0.9, (n, 2))
        wh = rng.uniform(0.03, 0.4, (n, 2))
        arr = np.concatenate([cls[:, None], xy, wh], axis=1).astype(np.float32)
        labels[b, :n] = arr
        mask[b, :n] = True
        per_image.append(arr)
    return labels, mask, per_image


def _random_preds(rng, bs, hw=64, nc=NC):
    shapes = [(bs, 3, hw // 8, hw // 8, 5 + nc),
              (bs, 3, hw // 16, hw // 16, 5 + nc),
              (bs, 3, hw // 32, hw // 32, 5 + nc)]
    return [rng.normal(0, 1, s).astype(np.float32) for s in shapes]


def test_grid_targets_match_sequential_golden(rng):
    bs, hw = 3, 64
    grid_sizes = [(hw // s, hw // s) for s in (8, 16, 32)]
    labels, mask, per_image = _random_labels(rng, bs, [5, 0, 12])
    got = build_grid_targets(jnp.asarray(labels), jnp.asarray(mask),
                             jnp.asarray(ANCHORS_PX), grid_sizes)
    exp = golden_grid_targets(per_image, ANCHORS_PX, grid_sizes)
    for s in range(3):
        g, e = np.asarray(got[s]), exp[s]
        assert g.shape == e.shape
        # objectness channel drives everything downstream — compare exactly
        np.testing.assert_array_equal(g[..., 4], e[..., 4], err_msg=f"scale {s}")
        pos = e[..., 4] == 1
        np.testing.assert_allclose(g[pos], e[pos], rtol=1e-5, atol=1e-6,
                                   err_msg=f"scale {s}")


def test_grid_targets_empty_batch():
    grid_sizes = [(8, 8), (4, 4), (2, 2)]
    labels = jnp.zeros((2, 10, 5))
    mask = jnp.zeros((2, 10), bool)
    got = build_grid_targets(labels, mask, jnp.asarray(ANCHORS_PX), grid_sizes)
    for t in got:
        assert float(jnp.abs(np.asarray(t)).sum()) == 0.0


def test_custom_loss_matches_golden(rng):
    bs, hw = 2, 64
    labels, mask, per_image = _random_labels(rng, bs, [6, 3])
    preds = _random_preds(rng, bs, hw)

    lc = LossConfig(nc=NC)
    loss_fn = YoloLoss(lc, ANCHORS_PX, kind="custom")
    total, parts = loss_fn([jnp.asarray(p) for p in preds],
                           jnp.asarray(labels), jnp.asarray(mask))
    exp_total, exp_parts = golden_custom_loss(preds, per_image, ANCHORS_PX, NC)
    np.testing.assert_allclose(float(total), exp_total, rtol=1e-4)
    for k in ("box", "obj", "cls"):
        np.testing.assert_allclose(float(parts[k]), exp_parts[k], rtol=1e-4,
                                   err_msg=k)


def test_ultralytics_loss_matches_golden(rng):
    bs, hw = 2, 64
    labels, mask, per_image = _random_labels(rng, bs, [6, 3])
    preds = _random_preds(rng, bs, hw)

    lc = LossConfig(nc=NC)
    loss_fn = YoloLoss(lc, ANCHORS_PX, kind="ultralytics")
    total, parts = loss_fn([jnp.asarray(p) for p in preds],
                           jnp.asarray(labels), jnp.asarray(mask))
    exp_total, exp_parts = golden_ultra_loss(preds, per_image, ANCHORS_PX, NC)
    np.testing.assert_allclose(float(total), exp_total, rtol=1e-4)
    for k in ("box", "obj", "cls"):
        np.testing.assert_allclose(float(parts[k]), exp_parts[k], rtol=1e-4,
                                   err_msg=k)


def test_ultralytics_edge_box_regresses_to_clipped_cell(rng):
    """A box centered exactly on the image edge (x_norm == 1.0): gij == nx
    for the center-offset row, which the reference clamps IN PLACE before
    building tbox (ultralytics_loss.py:285,296) — so dx must be 1.0
    relative to cell nx-1, not 0.0 relative to a nonexistent cell nx.
    Pinned at the target-builder level and through the full loss vs the
    sequential golden."""
    bs, hw = 1, 64
    labels = np.zeros((bs, 4, 5), np.float32)
    mask = np.zeros((bs, 4), bool)
    labels[0, 0] = [1, 1.0, 0.5, 0.2, 0.2]     # x on the right edge
    labels[0, 1] = [0, 0.5, 1.0, 0.2, 0.2]     # y on the bottom edge
    mask[0, :2] = True
    per_image = [labels[0, :2]]

    grid_sizes = [(hw // s, hw // s) for s in (8, 16, 32)]
    flat = build_flat_targets(jnp.asarray(labels), jnp.asarray(mask),
                              jnp.asarray(ANCHORS_PX), grid_sizes)
    checked = 0
    for s, (ny, nx) in enumerate(grid_sizes):
        rec = flat[s]
        v = np.asarray(rec["valid"])
        gi = np.asarray(rec["gi"])[v]
        gj = np.asarray(rec["gj"])[v]
        tcls = np.asarray(rec["tcls"])[v]
        tbox = np.asarray(rec["tbox"])[v]
        # the edge-x box (class 1): every row sits at the clipped cell
        # column nx-1 with dx == gx - (nx-1) == 1.0 (gx == nx exactly,
        # and its only offset candidates are center and left — both
        # resolve to column nx-1)
        edge_x = tcls == 1
        if edge_x.any():
            np.testing.assert_array_equal(gi[edge_x], nx - 1)
            np.testing.assert_allclose(tbox[edge_x, 0], 1.0)
            checked += 1
        edge_y = tcls == 0                      # the edge-y box
        if edge_y.any():
            np.testing.assert_array_equal(gj[edge_y], ny - 1)
            np.testing.assert_allclose(tbox[edge_y, 1], 1.0)
            checked += 1
    assert checked >= 2, "edge boxes matched no anchors at any scale"

    preds = _random_preds(rng, bs, hw)
    loss_fn = YoloLoss(LossConfig(nc=NC), ANCHORS_PX, kind="ultralytics")
    total, parts = loss_fn([jnp.asarray(p) for p in preds],
                           jnp.asarray(labels), jnp.asarray(mask))
    exp_total, exp_parts = golden_ultra_loss(preds, per_image, ANCHORS_PX, NC)
    np.testing.assert_allclose(float(total), exp_total, rtol=1e-4)


def test_loss_is_differentiable_and_finite(rng):
    bs, hw = 2, 64
    labels, mask, _ = _random_labels(rng, bs, [4, 1])
    preds = _random_preds(rng, bs, hw)
    for kind in ("custom", "ultralytics"):
        loss_fn = YoloLoss(LossConfig(nc=NC), ANCHORS_PX, kind=kind)

        def scalar(ps):
            return loss_fn(ps, jnp.asarray(labels), jnp.asarray(mask))[0]

        val, grads = jax.value_and_grad(scalar)([jnp.asarray(p) for p in preds])
        assert np.isfinite(float(val))
        for g in grads:
            assert np.all(np.isfinite(np.asarray(g))), kind
            assert float(jnp.abs(g).sum()) > 0, kind


def test_loss_zero_labels_no_nan(rng):
    bs, hw = 2, 64
    preds = _random_preds(rng, bs, hw)
    labels = jnp.zeros((bs, 10, 5))
    mask = jnp.zeros((bs, 10), bool)
    for kind in ("custom", "ultralytics"):
        loss_fn = YoloLoss(LossConfig(nc=NC), ANCHORS_PX, kind=kind)
        total, parts = loss_fn([jnp.asarray(p) for p in preds], labels, mask)
        assert np.isfinite(float(total))
        assert float(parts["box"]) == 0.0 and float(parts["cls"]) == 0.0
        assert float(parts["obj"]) > 0  # background BCE still applies


def test_loss_jits(rng):
    bs, hw = 2, 64
    labels, mask, _ = _random_labels(rng, bs, [4, 1])
    preds = [jnp.asarray(p) for p in _random_preds(rng, bs, hw)]
    loss_fn = YoloLoss(LossConfig(nc=NC), ANCHORS_PX, kind="custom")
    jitted = jax.jit(lambda ps, l, m: loss_fn(ps, l, m)[0])
    a = float(jitted(preds, jnp.asarray(labels), jnp.asarray(mask)))
    b = float(loss_fn(preds, jnp.asarray(labels), jnp.asarray(mask))[0])
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_focal_bce_semantics():
    from yolov5m_tpu.train.loss import bce_logits, focal_bce_logits

    logits = jnp.asarray([-6.0, -1.0, 0.0, 1.0, 6.0])
    labels = jnp.asarray([0.0, 0.0, 1.0, 1.0, 1.0])
    plain = np.asarray(bce_logits(logits, labels))
    focal0 = np.asarray(focal_bce_logits(logits, labels, gamma=0.0))
    # gamma=0 reduces to alpha-weighted BCE (alpha 0.25 pos / 0.75 neg)
    alpha_t = np.where(np.asarray(labels) == 1.0, 0.25, 0.75)
    np.testing.assert_allclose(focal0, plain * alpha_t, rtol=1e-6)
    # well-classified examples are down-weighted much harder than marginal
    focal2 = np.asarray(focal_bce_logits(logits, labels, gamma=2.0))
    ratio = focal2 / np.maximum(focal0, 1e-12)
    assert ratio[0] < 1e-4 and ratio[4] < 1e-4   # confident correct
    assert ratio[2] > 0.2                        # p=0.5: mild down-weight


def test_label_smoothing_changes_cls_targets_only():
    """ls>0 must change the cls term; box/obj terms stay identical; ls=0
    reproduces the default loss bit-for-bit."""
    from yolov5m_tpu.train.loss import LossConfig, YoloLoss

    rng = np.random.default_rng(11)
    bs, nb, nc, hw = 2, 6, 4, 64
    preds = [jnp.asarray(rng.normal(0, 1, (bs, 3, hw // s, hw // s, 5 + nc))
                         .astype(np.float32)) for s in (8, 16, 32)]
    labels = np.zeros((bs, nb, 5), np.float32)
    labels[:, 0] = [1, 0.5, 0.5, 0.2, 0.3]
    labels[:, 1] = [3, 0.25, 0.7, 0.15, 0.2]
    mask = np.zeros((bs, nb), bool)
    mask[:, :2] = True
    anchors = np.asarray(ANCHORS, np.float32)

    base = YoloLoss(LossConfig(nc=nc, image_size=hw),
                    anchors)(preds, jnp.asarray(labels), jnp.asarray(mask))
    zero = YoloLoss(LossConfig(nc=nc, image_size=hw, label_smoothing=0.0),
                    anchors)(preds, jnp.asarray(labels), jnp.asarray(mask))
    smooth = YoloLoss(LossConfig(nc=nc, image_size=hw, label_smoothing=0.1),
                      anchors)(preds, jnp.asarray(labels), jnp.asarray(mask))

    assert float(base[0]) == float(zero[0])
    assert float(smooth[1]["box"]) == float(base[1]["box"])
    assert float(smooth[1]["obj"]) == float(base[1]["obj"])
    assert float(smooth[1]["cls"]) != float(base[1]["cls"])


def test_num_den_compose_equals_call(rng):
    """YoloLoss.num_den + compose is bit-identical to __call__ for both
    loss kinds — parallel/pp.py composes the loss from these raw
    numerator/denominator sums outside its shard_map, so any drift
    between the two paths would silently skew PP training."""
    bs = 3
    labels, mask, _ = _random_labels(rng, bs, counts=[1, 4, 2])
    preds = _random_preds(rng, bs)
    for kind in ("custom", "ultralytics"):
        lf = YoloLoss(LossConfig(nc=NC, image_size=64),
                      np.asarray(ANCHORS, np.float32), kind=kind)
        total, parts = lf(list(map(jnp.asarray, preds)),
                          jnp.asarray(labels), jnp.asarray(mask))
        nums, dens = lf.num_den(list(map(jnp.asarray, preds)),
                                jnp.asarray(labels), jnp.asarray(mask))
        for part in ("box", "obj", "cls"):
            assert nums[part].shape == dens[part].shape == (3,)
        total2, parts2 = lf.compose(nums, dens, bs)
        assert float(total) == float(total2), kind
        for k in parts:
            assert float(parts[k]) == float(parts2[k]), (kind, k)


def test_num_den_cross_shard_sum_is_global_mean(rng):
    """Summing num/den over batch shards BEFORE dividing reproduces the
    full-batch loss exactly even with uneven box counts per shard — the
    property DPxPP training relies on (a sum of per-shard means would
    differ here)."""
    labels, mask, _ = _random_labels(rng, 4, counts=[1, 7, 3, 2])
    preds = _random_preds(rng, 4)
    for kind in ("custom", "ultralytics"):
        lf = YoloLoss(LossConfig(nc=NC, image_size=64),
                      np.asarray(ANCHORS, np.float32), kind=kind)
        full, _ = lf(list(map(jnp.asarray, preds)),
                     jnp.asarray(labels), jnp.asarray(mask))
        acc = None
        local_means = 0.0
        for sl in (slice(0, 2), slice(2, 4)):  # two "data shards"
            nd = lf.num_den([jnp.asarray(p[sl]) for p in preds],
                            jnp.asarray(labels[sl]), jnp.asarray(mask[sl]))
            acc = nd if acc is None else jax.tree.map(jnp.add, acc, nd)
            local_means += float(lf.compose(*nd, 2)[0])
        composed = float(lf.compose(*acc, 4)[0])
        np.testing.assert_allclose(composed, float(full), rtol=1e-6)
        # teeth: with uneven counts the sum of per-shard LOCAL losses (the
        # quantity a naive composition would produce — both scale by the
        # same global bs overall) really differs from the exact global one
        assert abs(local_means - composed) / composed > 1e-4, kind
