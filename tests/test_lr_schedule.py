"""LR schedule construction + donation-safety invariants of the TrainState."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from yolov5m_tpu.config import Config
from yolov5m_tpu.models import YOLOv5
from yolov5m_tpu.train.trainer import (
    create_train_state, make_lr_schedule, make_optimizer)


def test_constant_schedule_is_reference_lr():
    cfg = Config()
    assert make_lr_schedule(cfg) == cfg.learning_rate


def test_cosine_schedule_shape():
    cfg = dataclasses.replace(Config(), lr_schedule="cosine",
                              warmup_steps=100, lr_final=0.01)
    total = 1000
    sched = make_lr_schedule(cfg, total_steps=total)
    lr = cfg.learning_rate
    assert float(sched(0)) == 0.0                          # warmup start
    np.testing.assert_allclose(float(sched(50)), lr / 2, rtol=1e-5)
    np.testing.assert_allclose(float(sched(100)), lr, rtol=1e-5)  # peak
    # monotone decay after warmup, floor at lr * lr_final
    assert float(sched(500)) < lr
    np.testing.assert_allclose(float(sched(total)), lr * cfg.lr_final,
                               rtol=1e-4)


def test_cosine_without_warmup():
    cfg = dataclasses.replace(Config(), lr_schedule="cosine", warmup_steps=0)
    sched = make_lr_schedule(cfg, total_steps=100)
    np.testing.assert_allclose(float(sched(0)), cfg.learning_rate, rtol=1e-6)


def test_train_state_has_no_aliased_buffers():
    """donate_argnums=0 on the train step requires every leaf of the state
    to own its buffer — params and ema_params in particular must not alias
    (JAX refuses to donate the same buffer twice)."""
    cfg = Config(first_out=8, nc=4, image_size=64)
    model = YOLOv5(first_out=8, nc=4)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), (64, 64),
                               make_optimizer(cfg))
    seen = set()
    for leaf in jax.tree.leaves(state):
        if isinstance(leaf, jax.Array) and leaf.size > 0:
            ptr = leaf.unsafe_buffer_pointer()
            assert ptr not in seen, "aliased buffers in TrainState"
            seen.add(ptr)


def test_upgrade_opt_state_under_guard_nonfinite():
    """Resuming a --guard_nonfinite constant-lr checkpoint into a guarded
    cosine run: the opt_state is an ApplyIfFiniteState wrapper, and the
    schedule-count graft must recurse into .inner_state instead of indexing
    the wrapper's scalar fields (advisor repro: AttributeError 'ArrayImpl'
    has no attribute 'count')."""
    import optax

    from yolov5m_tpu.train.trainer import upgrade_opt_state_to_schedule

    params = {"w": jnp.ones((3, 3)), "b": jnp.zeros((3,))}
    cfg_const = dataclasses.replace(Config(), guard_nonfinite=True)
    opt_const = make_optimizer(cfg_const)
    st = opt_const.init(params)
    # take a couple of constant-lr steps so Adam's count is nonzero
    grads = jax.tree.map(jnp.ones_like, params)
    for _ in range(3):
        _, st = opt_const.update(grads, st, params)

    upgraded = upgrade_opt_state_to_schedule(st)
    inner = upgraded.inner_state
    assert isinstance(inner[3], optax.ScaleByScheduleState)
    assert int(inner[3].count) == int(inner[2].count) == 3

    # and the upgraded state must actually drive the cosine optimizer
    cfg_cos = dataclasses.replace(Config(), guard_nonfinite=True,
                                  lr_schedule="cosine", warmup_steps=0)
    opt_cos = make_optimizer(cfg_cos, total_steps=100)
    updates, _ = opt_cos.update(grads, upgraded, params)
    assert all(np.isfinite(np.asarray(u)).all()
               for u in jax.tree.leaves(updates))

    # unguarded states still upgrade exactly as before
    opt_plain = make_optimizer(dataclasses.replace(Config()))
    st_plain = opt_plain.init(params)
    up_plain = upgrade_opt_state_to_schedule(st_plain)
    assert isinstance(up_plain[3], optax.ScaleByScheduleState)


def test_flat_optimizer_matches_per_leaf():
    """The raveled flat-vector update path (cfg.flat_optimizer, opt-in) is
    numerically equivalent to the per-leaf path: clip_by_global_norm is a
    global reduction either way; everything else is elementwise. Covers both
    accumulate=1 and the accumulate=2 lax.cond path, params and EMA."""
    from yolov5m_tpu.config import ANCHORS
    from yolov5m_tpu.train import LossConfig, YoloLoss
    from yolov5m_tpu.train.trainer import make_train_step

    cfg = Config(first_out=8, nc=4, image_size=64)
    model = YOLOv5(first_out=8, nc=4)
    loss_fn = YoloLoss(LossConfig(nc=4, image_size=64),
                       np.asarray(ANCHORS, np.float32))
    opt = make_optimizer(cfg)

    labels = np.zeros((2, 4, 5), np.float32)
    labels[:, 0] = [1, 0.5, 0.5, 0.2, 0.3]
    mask = np.zeros((2, 4), bool)
    mask[:, 0] = True
    rng = np.random.default_rng(0)
    images = [jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
              for _ in range(3)]

    for accumulate in (1, 2):
        states = {}
        for flat in (True, False):
            state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                       (64, 64), opt, flat=flat)
            step = jax.jit(make_train_step(model, loss_fn, opt,
                                           accumulate=accumulate, flat=flat))
            for img in images:
                state, metrics = step(state, img, jnp.asarray(labels),
                                      jnp.asarray(mask))
            states[flat] = (state, float(metrics["loss"]))
        (s_flat, l_flat), (s_tree, l_tree) = states[True], states[False]
        np.testing.assert_allclose(l_flat, l_tree, rtol=1e-5)
        # Adam's m/sqrt(v) is ill-conditioned for near-zero gradients, so
        # reduction-order ulp noise (the flat path's single norm vs the
        # per-leaf sum of squares) can flip a handful of tiny updates by a
        # fraction of one lr step. Bound: <=0.01% of elements beyond 1e-5,
        # none beyond 0.2*lr (1e-4).
        for tree_a, tree_b in (((s_flat.params), (s_tree.params)),
                               ((s_flat.ema_params), (s_tree.ema_params))):
            diffs = np.concatenate(
                [np.abs(np.asarray(a) - np.asarray(b)).ravel()
                 for a, b in zip(jax.tree.leaves(tree_a),
                                 jax.tree.leaves(tree_b))])
            assert diffs.max() < 0.2 * cfg.learning_rate, diffs.max()
            assert (diffs > 1e-5).mean() < 1e-4, (diffs > 1e-5).mean()


def test_flat_optimizer_update_math_is_exactly_equivalent():
    """Direct optimizer-level check with a FIXED gradient (no model, no
    conditioning issues): one update through the chain applied flat vs
    per-leaf differs only at float ulp level."""
    import jax.flatten_util

    cfg = Config()
    opt = make_optimizer(cfg)
    rng = np.random.default_rng(1)
    params = {"w": jnp.asarray(rng.normal(0, 0.1, (64, 32)), jnp.float32),
              "b": jnp.asarray(rng.normal(0, 0.1, (32,)), jnp.float32)}
    grads = {"w": jnp.asarray(rng.normal(0, 1.0, (64, 32)), jnp.float32),
             "b": jnp.asarray(rng.normal(0, 1.0, (32,)), jnp.float32)}

    st_tree = opt.init(params)
    up_tree, _ = opt.update(grads, st_tree, params)

    flat_params, unravel = jax.flatten_util.ravel_pytree(params)
    flat_grads = jax.flatten_util.ravel_pytree(grads)[0]
    st_flat = opt.init(flat_params)
    up_flat, _ = opt.update(flat_grads, st_flat, flat_params)
    up_flat_tree = unravel(up_flat)

    for a, b in zip(jax.tree.leaves(up_flat_tree), jax.tree.leaves(up_tree)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-9)


def test_guard_nonfinite_skips_bad_updates():
    """cfg.guard_nonfinite: a NaN-producing batch must leave params and EMA
    untouched; a clean batch must still update them."""
    from yolov5m_tpu.config import ANCHORS
    from yolov5m_tpu.train import LossConfig, YoloLoss
    from yolov5m_tpu.train.trainer import make_train_step

    cfg = dataclasses.replace(Config(first_out=8, nc=4, image_size=64),
                              guard_nonfinite=True)
    model = YOLOv5(first_out=8, nc=4)
    loss_fn = YoloLoss(LossConfig(nc=4, image_size=64),
                       np.asarray(ANCHORS, np.float32))
    opt = make_optimizer(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), (64, 64),
                               opt)
    step = jax.jit(make_train_step(model, loss_fn, opt, accumulate=1))

    labels = np.zeros((2, 4, 5), np.float32)
    labels[:, 0] = [1, 0.5, 0.5, 0.2, 0.3]
    mask = np.zeros((2, 4), bool)
    mask[:, 0] = True
    clean = jnp.ones((2, 64, 64, 3), jnp.float32) * 0.5
    poison = clean.at[0, 0, 0, 0].set(jnp.nan)

    p0 = jax.tree.map(np.asarray, state.params)
    state, metrics = step(state, poison, jnp.asarray(labels),
                          jnp.asarray(mask))
    p1 = jax.tree.map(np.asarray, state.params)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_array_equal(a, b)   # update skipped

    state, metrics = step(state, clean, jnp.asarray(labels),
                          jnp.asarray(mask))
    p2 = jax.tree.leaves(jax.tree.map(np.asarray, state.params))
    changed = any(not np.array_equal(a, b)
                  for a, b in zip(jax.tree.leaves(p1), p2))
    assert changed, "clean batch failed to update params"
