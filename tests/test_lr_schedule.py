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
