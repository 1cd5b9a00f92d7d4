"""Jitted training step: forward + loss + grad + Adam, with gradient
accumulation, global-norm clipping, and EMA — all inside one XLA graph.

Capability parity with the reference train loop (reference
utils/training_utils.py:81-132):
  * Adam(lr=5e-4, weight_decay=5e-4) — torch-style coupled L2
    (reference train.py:61);
  * gradient accumulation to a nominal batch of 64: grads are *summed* over
    `accumulate` micro-batches and applied once (training_utils.py:87-90,
    116-122; the reference's loss is already scaled by bs, ours too);
  * grad clipping max_norm=10.0 before the optimizer (training_utils.py:118).

TPU-native differences: no GradScaler — bf16 needs no loss scaling (the
reference's AMP scaler at train.py:56 is CUDA-coupled); the whole step,
including target assignment, is one compiled graph; EMA of params is
maintained on-device (Ultralytics-style ramped decay), which the reference
lacks but the north-star config requires (BASELINE.json configs[4]).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.struct
import jax
import jax.flatten_util
import jax.numpy as jnp
import optax

from yolov5m_tpu.config import Config
from yolov5m_tpu.train.loss import YoloLoss


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray                    # micro-batch counter
    params: Any
    batch_stats: Any
    opt_state: Any
    accum_grads: Any                     # summed grads since last opt step
    ema_params: Any

    @property
    def eval_params(self):
        return self.ema_params


def make_lr_schedule(cfg: Config, total_steps: Optional[int] = None):
    """Learning-rate schedule in OPTIMIZER steps (accumulation-gated updates,
    not micro-batches). "constant" reproduces the reference (train.py:61);
    "cosine" is the production recipe: linear warmup 0→lr over
    cfg.warmup_steps, then cosine decay to lr*cfg.lr_final at total_steps.
    """
    if cfg.lr_schedule == "constant":
        return cfg.learning_rate
    if cfg.lr_schedule == "cosine":
        assert total_steps is not None, "cosine schedule needs total_steps"
        decay_steps = max(total_steps - cfg.warmup_steps, 1)
        cosine = optax.cosine_decay_schedule(
            cfg.learning_rate, decay_steps, alpha=cfg.lr_final)
        if cfg.warmup_steps <= 0:
            return cosine
        warmup = optax.linear_schedule(0.0, cfg.learning_rate,
                                       cfg.warmup_steps)
        return optax.join_schedules([warmup, cosine], [cfg.warmup_steps])
    raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")


def make_optimizer(cfg: Config,
                   total_steps: Optional[int] = None
                   ) -> optax.GradientTransformation:
    """clip(10.0) → +wd·θ (torch Adam coupled L2) → Adam → -lr(schedule).

    cfg.guard_nonfinite wraps the chain in optax.apply_if_finite: a step
    whose gradients contain NaN/inf leaves params and optimizer state
    untouched instead of poisoning them (production guard for long bf16
    runs; off by default — the wrapper changes the opt_state structure, so
    checkpoints are not interchangeable across the flag).
    """
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(make_lr_schedule(cfg, total_steps)),
    )
    if cfg.guard_nonfinite:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    return tx


def upgrade_opt_state_to_schedule(opt_state):
    """Adapt an opt_state saved under the constant-lr optimizer (ScaleState,
    empty) to the schedule-based optimizer (ScaleByScheduleState(count)):
    the schedule count is grafted from Adam's step count (index 2 in the
    make_optimizer chain), so a resumed run continues the schedule from the
    right position instead of failing to deserialize.

    cfg.guard_nonfinite wraps the chain in optax.apply_if_finite, whose state
    is an ApplyIfFiniteState holding the chain tuple as `.inner_state` — the
    graft then applies to the inner tuple and the wrapper is rebuilt around
    it (indexing the wrapper directly would hit its scalar fields)."""
    if hasattr(opt_state, "inner_state"):  # optax.ApplyIfFiniteState
        return opt_state._replace(
            inner_state=upgrade_opt_state_to_schedule(opt_state.inner_state))
    parts = list(opt_state)
    adam = parts[2]
    parts[3] = optax.ScaleByScheduleState(count=adam.count)
    return tuple(parts)


def create_train_state(model, cfg: Config, rng, input_hw: Tuple[int, int],
                       optimizer: Optional[optax.GradientTransformation] = None,
                       flat: Optional[bool] = None) -> TrainState:
    """flat (default cfg.flat_optimizer = False): hold opt_state and
    accum_grads on ONE raveled parameter vector and run the whole update
    chain over it. Measured ~3% SLOWER than the per-leaf path on chip
    (round 3, benchmarks/profile_train_flat.py — the round-2 "7.5ms
    per-leaf overhead" was per-call dispatch inflation); kept as an
    option for resuming round-2 flat-layout checkpoints. Must match the
    `flat` passed to make_train_step."""
    variables = model.init(rng, jnp.zeros((1, *input_hw, 3), jnp.float32))
    if optimizer is None:
        if cfg.lr_schedule == "cosine":
            # make_optimizer would assert on total_steps=None deep in
            # make_lr_schedule; the opt_state built here must match the
            # optimizer the caller will train with, so guessing a horizon
            # is not an option — fail with the recipe instead
            raise ValueError(
                "cfg.lr_schedule='cosine' needs the actual optimizer "
                "(its schedule is sized by total_steps): build it with "
                "make_optimizer(cfg, total_steps=...) and pass it to "
                "create_train_state")
        optimizer = make_optimizer(cfg)
    params = variables["params"]
    flat = cfg.flat_optimizer if flat is None else flat
    if flat:
        flat_params, _ = jax.flatten_util.ravel_pytree(params)
        opt_state = optimizer.init(flat_params)
        accum = jnp.zeros_like(flat_params)
    else:
        opt_state = optimizer.init(params)
        accum = jax.tree.map(jnp.zeros_like, params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables["batch_stats"],
        opt_state=opt_state,
        accum_grads=accum,
        # materialized copy, NOT an alias of params: a donated train step
        # (jit(..., donate_argnums=0)) must not see the same buffer twice
        ema_params=jax.tree.map(lambda x: x.copy(), params),
    )


def _ema_decay(step: jnp.ndarray, base: float = 0.9999, tau: float = 2000.0):
    """Ultralytics-style ramped EMA decay: base * (1 - exp(-step/tau))."""
    return base * (1.0 - jnp.exp(-step.astype(jnp.float32) / tau))


def make_train_step(
    model,
    loss_fn: YoloLoss,
    optimizer: optax.GradientTransformation,
    accumulate: int = 1,
    pmean_axis: Optional[str] = None,
    flat: bool = False,
) -> Callable:
    """Build the train-step function (jit it, or shard_map it for DP).

    Args:
      accumulate: opt step every N micro-batches (N = round(64/bs), reference
        training_utils.py:89).
      pmean_axis: if set, batch_stats are pmean-reduced over this mesh axis
        (the DP path; see parallel/dp.py). Gradients need NO reduction
        here: the loss's internal psums already make them global, and an
        extra psum would multiply them by the mesh size (see the inline
        comment in the step body).
      flat: run the whole optimizer/EMA/accumulation update in raveled
        flat-vector space. Numerically equivalent — clip_by_global_norm is
        already a global reduction, and every other chain member is
        elementwise — but measured ~3% slower on chip than the per-leaf
        path (ravel/unravel copy traffic; XLA fuses the per-leaf chain
        fine). Off by default; must match the layout create_train_state
        built (cfg.flat_optimizer).
    """

    if pmean_axis is not None and loss_fn.axis_name != pmean_axis:
        loss_fn = loss_fn.with_axis(pmean_axis)

    def train_step(state: TrainState, image, labels, mask):
        def loss_of(params):
            preds, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                image, train=True, mutable=["batch_stats"])
            total, parts = loss_fn(preds, labels, mask)
            return total, (parts, mut["batch_stats"])

        (total, (parts, new_stats)), grads = \
            jax.value_and_grad(loss_of, has_aux=True)(state.params)

        if pmean_axis is not None:
            # The loss is GLOBAL (internal psums over the mesh axis, see
            # YoloLoss.axis_name), and jax.grad's transpose of psum inside
            # shard_map already delivers the full global gradient on every
            # device — no further reduction needed (an extra psum would
            # multiply grads by the mesh size; verified empirically).
            # BN running buffers: average so replicas stay bitwise in sync
            # (forward stats are local unless the model sets bn_axis=sync-BN).
            new_stats = jax.lax.pmean(new_stats, pmean_axis)

        step = state.step + 1

        if flat:
            flat_grads, unravel = jax.flatten_util.ravel_pytree(grads)
            flat_params = jax.flatten_util.ravel_pytree(state.params)[0]
            ema_flat = jax.flatten_util.ravel_pytree(state.ema_params)[0]

            if accumulate == 1:
                gnorm = jnp.linalg.norm(flat_grads)
                updates, new_opt = optimizer.update(
                    flat_grads, state.opt_state, flat_params)
                new_flat = flat_params + updates
                d = _ema_decay(step)
                new_ema_flat = ema_flat * d + new_flat * (1.0 - d)
                new_accum = state.accum_grads
            else:
                accum = state.accum_grads + flat_grads
                # the norm the clip will act on: the accumulated gradient
                # so far (at the firing micro-batch this IS the clipped
                # vector; a per-micro-batch norm would hide clipping
                # saturation — and parallel/pp.py reports the same sum)
                gnorm = jnp.linalg.norm(accum)
                do_update = (step % accumulate) == 0

                def apply_update(_):
                    updates, new_opt = optimizer.update(
                        accum, state.opt_state, flat_params)
                    new_flat = flat_params + updates
                    d = _ema_decay(step // accumulate)
                    return (new_flat, new_opt, jnp.zeros_like(accum),
                            ema_flat * d + new_flat * (1.0 - d))

                def keep(_):
                    return flat_params, state.opt_state, accum, ema_flat

                new_flat, new_opt, new_accum, new_ema_flat = jax.lax.cond(
                    do_update, apply_update, keep, None)

            new_params = unravel(new_flat)
            new_ema = unravel(new_ema_flat)
        elif accumulate == 1:
            # static specialization: every micro-batch is an optimizer step,
            # so skip the accumulation buffer (two full param-tree passes)
            # and the lax.cond entirely
            updates, new_opt = optimizer.update(grads, state.opt_state,
                                                state.params)
            new_params = optax.apply_updates(state.params, updates)
            d = _ema_decay(step)
            new_ema = jax.tree.map(
                lambda e, p: e * d + p * (1.0 - d), state.ema_params,
                new_params)
            new_accum = state.accum_grads
            gnorm = optax.global_norm(grads)
        else:
            accum = jax.tree.map(jnp.add, state.accum_grads, grads)
            # norm of the ACCUMULATED gradient — what clip_by_global_norm
            # acts on at the firing micro-batch (see flat branch comment)
            gnorm = optax.global_norm(accum)
            do_update = (step % accumulate) == 0

            def apply_update(_):
                updates, new_opt = optimizer.update(accum, state.opt_state,
                                                    state.params)
                new_params = optax.apply_updates(state.params, updates)
                d = _ema_decay(step // accumulate)
                new_ema = jax.tree.map(
                    lambda e, p: e * d + p * (1.0 - d), state.ema_params,
                    new_params)
                zeroed = jax.tree.map(jnp.zeros_like, accum)
                return new_params, new_opt, zeroed, new_ema

            def keep(_):
                return state.params, state.opt_state, accum, state.ema_params

            new_params, new_opt, new_accum, new_ema = jax.lax.cond(
                do_update, apply_update, keep, None)

        new_state = state.replace(
            step=step, params=new_params, batch_stats=new_stats,
            opt_state=new_opt, accum_grads=new_accum, ema_params=new_ema)

        metrics = {"loss": total, "grad_norm": gnorm, **parts}
        return new_state, metrics

    return train_step


def accumulation_steps(batch_size: int, nominal: int = 64) -> int:
    """max(round(nbs/bs), 1) — reference training_utils.py:89."""
    return max(round(nominal / batch_size), 1)
