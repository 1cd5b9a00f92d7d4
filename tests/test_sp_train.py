"""Spatially-partitioned TRAINING (parallel/sp.py make_sp_train_step) on the
virtual CPU mesh.

GSPMD partitions the conv forward AND backward over the row axis (halo
exchanges for the window-op gradients) and auto-inserts the cross-shard
reductions for loss, grads, and BatchNorm batch statistics.

Numerics note (investigated 2026-08-18): with eval-mode BN the gradients are
BIT-IDENTICAL across all shardings, and with float64 compute the train-mode
gradients converge to the single-device values (gnorm matches to ~1e-5
relative on the shipped mesh configs) — so the partitioned program is
semantically exact. In float32, however, the BN batch-statistics backward
(g - mean(g) - x_hat*mean(g*x_hat): near-cancelling big reductions) amplifies
reduction-order noise at random init enough to visibly perturb raw gradients,
and Adam's mu buffer stores that raw gradient. The tests therefore compare
LOSS + PARAMS + EMA + BN stats in f32 (Adam normalizes the noise away:
params agree to ~2*lr, same bound tests/test_trainer_dp.py uses) and pin
exact gradient equivalence in a dedicated float64 test.
"""

import numpy as np
import jax
import jax.numpy as jnp

from yolov5m_tpu.config import ANCHORS, Config
from yolov5m_tpu.models import YOLOv5
from yolov5m_tpu.parallel import make_sp_mesh, make_sp_train_step
from yolov5m_tpu.train import LossConfig, YoloLoss
from yolov5m_tpu.train.trainer import (
    create_train_state, make_optimizer, make_train_step)

NC = 4
HW = 128  # P5 grid = 4 rows: n_spatial=2 keeps >= 2 rows/shard


def _setup(bs):
    cfg = Config(first_out=8, nc=NC, image_size=HW, batch_size=bs,
                 compute_dtype="float32")
    model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.float32)
    loss_fn = YoloLoss(LossConfig(nc=NC, image_size=HW),
                       np.asarray(ANCHORS, np.float32), kind="custom")
    optimizer = make_optimizer(cfg)

    def fresh_state():
        return create_train_state(model, cfg, jax.random.PRNGKey(0),
                                  (HW, HW), optimizer)

    return model, loss_fn, optimizer, fresh_state


def _batch(rng, bs):
    image = rng.uniform(0, 1, (bs, HW, HW, 3)).astype(np.float32)
    labels = np.zeros((bs, 8, 5), np.float32)
    labels[:, 0] = [1, 0.4, 0.6, 0.3, 0.2]
    labels[:, 1] = [2, 0.7, 0.3, 0.2, 0.4]
    mask = np.zeros((bs, 8), bool)
    mask[:, :2] = True
    return jnp.asarray(image), jnp.asarray(labels), jnp.asarray(mask)


def _assert_close(a, b, atol):
    """Compare params + EMA + BN stats (NOT raw Adam moments — see module
    docstring). atol just above 2*lr: near-zero-gradient elements can flip
    sign under different reduction orders and Adam's first update is +-lr."""
    for field in ("params", "ema_params", "batch_stats"):
        fa = jax.tree.leaves(jax.device_get(getattr(a, field)))
        fb = jax.tree.leaves(jax.device_get(getattr(b, field)))
        assert len(fa) == len(fb)
        for x, y in zip(fa, fb):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=atol, rtol=1e-4)


def test_sp_train_step_matches_single_device(rng):
    """2-D (data=2, spatial=2) mesh: one step equals the single-device step
    (loss, params, EMA, BN stats)."""
    bs = 4
    model, loss_fn, optimizer, fresh_state = _setup(bs)
    image, labels, mask = _batch(rng, bs)

    ref_step = jax.jit(make_train_step(model, loss_fn, optimizer))
    ref_state, ref_metrics = ref_step(fresh_state(), image, labels, mask)

    mesh = make_sp_mesh(n_data=2, n_spatial=2)
    sp_step = make_sp_train_step(model, loss_fn, optimizer, mesh)
    sp_state, sp_metrics = sp_step(fresh_state(), image, labels, mask)

    np.testing.assert_allclose(float(sp_metrics["loss"]),
                               float(ref_metrics["loss"]), atol=2e-5)
    _assert_close(sp_state, ref_state, atol=2.1e-3)


def test_sp_train_pure_spatial_mesh(rng):
    """1-D pure-SP mesh (no data axis): the bs-smaller-than-mesh case."""
    bs = 1
    model, loss_fn, optimizer, fresh_state = _setup(bs)
    image, labels, mask = _batch(rng, bs)

    ref_step = jax.jit(make_train_step(model, loss_fn, optimizer))
    ref_state, ref_metrics = ref_step(fresh_state(), image, labels, mask)

    mesh = make_sp_mesh(n_data=1, n_spatial=4)
    sp_step = make_sp_train_step(model, loss_fn, optimizer, mesh,
                                 data_axis=None)
    sp_state, sp_metrics = sp_step(fresh_state(), image, labels, mask)

    np.testing.assert_allclose(float(sp_metrics["loss"]),
                               float(ref_metrics["loss"]), atol=2e-5)
    _assert_close(sp_state, ref_state, atol=2.1e-3)


def test_sp_train_multi_step_and_accumulate(rng):
    """3 steps with accumulate=2: BN stats, the lax.cond-gated optimizer
    update, and the EMA all evolve like the single-device run.

    Trajectory tolerances: after step 1 the two runs hold params that
    differ by +-lr on near-zero-gradient elements (see module docstring),
    so they are slightly different training trajectories — losses track at
    the percent level, not float precision. Exact equivalence is pinned by
    the single-step and float64 tests above."""
    bs = 2
    model, loss_fn, optimizer, fresh_state = _setup(bs)

    ref_step = jax.jit(make_train_step(model, loss_fn, optimizer,
                                       accumulate=2))
    mesh = make_sp_mesh(n_data=2, n_spatial=2)
    sp_step = make_sp_train_step(model, loss_fn, optimizer, mesh,
                                 accumulate=2)

    ref_state, sp_state = fresh_state(), fresh_state()
    for i in range(3):
        image, labels, mask = _batch(np.random.default_rng(100 + i), bs)
        ref_state, ref_m = ref_step(ref_state, image, labels, mask)
        sp_state, sp_m = sp_step(sp_state, image, labels, mask)
        np.testing.assert_allclose(float(sp_m["loss"]), float(ref_m["loss"]),
                                   rtol=5e-2)
        assert np.isfinite(float(sp_m["loss"]))
    assert int(jax.device_get(sp_state.step)) == 3
    _assert_close(sp_state, ref_state, atol=2e-2)


def test_sp_train_grads_semantically_exact_f64(rng):
    """float64 compute: the spatially-partitioned train-mode gradient equals
    the single-device gradient tightly — proof the f32 state deltas above
    are reduction-order noise through the BN-statistics backward, not a
    semantic difference in the partitioned program."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    entry_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        bs = 4
        model = YOLOv5(first_out=8, nc=NC, dtype=jnp.float64)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, HW, HW, 3)))
        params = jax.tree.map(lambda x: x.astype(jnp.float64),
                              variables["params"])
        stats = jax.tree.map(lambda x: x.astype(jnp.float64),
                             variables["batch_stats"])
        loss_fn = YoloLoss(LossConfig(nc=NC, image_size=HW),
                           np.asarray(ANCHORS, np.float32), kind="custom")
        image, labels, mask = _batch(rng, bs)
        image = image.astype(jnp.float64)

        def loss_of(params, image):
            preds, _ = model.apply(
                {"params": params, "batch_stats": stats}, image,
                train=True, mutable=["batch_stats"])
            return loss_fn(preds, labels, mask)[0]

        gfn = jax.value_and_grad(loss_of)
        l_ref, g_ref = jax.jit(gfn)(params, image)

        mesh = make_sp_mesh(n_data=2, n_spatial=2)
        repl = NamedSharding(mesh, P())
        img_s = NamedSharding(mesh, P("data", "spatial"))
        l_sp, g_sp = jax.jit(gfn, in_shardings=(repl, img_s),
                             out_shardings=(repl, repl))(params, image)

        np.testing.assert_allclose(float(l_sp), float(l_ref), atol=1e-5)
        ref_norm = float(jnp.sqrt(sum((g ** 2).sum()
                                      for g in jax.tree.leaves(g_ref))))
        sp_norm = float(jnp.sqrt(sum((g ** 2).sum()
                                     for g in jax.tree.leaves(g_sp))))
        np.testing.assert_allclose(sp_norm, ref_norm, rtol=1e-4)
        for a, b in zip(jax.tree.leaves(jax.device_get(g_ref)),
                        jax.tree.leaves(jax.device_get(g_sp))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3, rtol=1e-3)
    finally:
        jax.config.update("jax_enable_x64", entry_x64)
