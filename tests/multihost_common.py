"""Shared model/step setup for the multi-host DP smoke test.

Used both by the in-process reference run (tests/test_multihost.py) and the
spawned workers (tests/multihost_worker.py) so the two paths execute the
exact same math — the only difference is how the mesh spans processes.
"""

import numpy as np


def make_global_batch(bs: int = 4, hw: int = 64, nb: int = 8) -> dict:
    rng = np.random.default_rng(0)
    labels = np.zeros((bs, nb, 5), np.float32)
    labels[:, 0] = [1, 0.5, 0.5, 0.2, 0.3]
    mask = np.zeros((bs, nb), bool)
    mask[:, 0] = True
    return {
        "image": rng.uniform(0, 1, (bs, hw, hw, 3)).astype(np.float32),
        "labels": labels,
        "mask": mask,
    }


def run_dp_step_over(mesh, local_batch, hw: int = 64, barrier=None) -> float:
    """One DP train step over `mesh`; `local_batch` is this process's shard
    (the full batch in single-process runs). Returns the global loss.

    barrier: optional zero-arg callable invoked AFTER compilation and BEFORE
    the first execution. Multi-process CPU runs need it: the dp_step compile
    takes minutes and is not synchronized across processes, while Gloo's
    collective-context rendezvous at first execution times out after 30s —
    without aligning here, whichever process compiles first gives up waiting
    for the other."""
    import jax
    import jax.numpy as jnp

    from yolov5m_tpu.config import ANCHORS, Config
    from yolov5m_tpu.models import YOLOv5
    from yolov5m_tpu.parallel import (
        make_dp_train_step, replicate_state, shard_batch)
    from yolov5m_tpu.train import LossConfig, YoloLoss
    from yolov5m_tpu.train.trainer import create_train_state, make_optimizer

    n_dev = mesh.devices.size
    cfg = Config(first_out=8, nc=4, image_size=hw, batch_size=n_dev,
                 compute_dtype="float32")
    model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.float32)
    loss_fn = YoloLoss(LossConfig(nc=cfg.nc, image_size=hw),
                       np.asarray(ANCHORS, np.float32), kind="custom")
    optimizer = make_optimizer(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), (hw, hw),
                               optimizer)

    dp_step = make_dp_train_step(model, loss_fn, optimizer, mesh, accumulate=1)
    state = replicate_state(state, mesh)
    batch = shard_batch(local_batch, mesh)
    args = (state, batch["image"], batch["labels"], batch["mask"])
    if barrier is not None:
        compiled = dp_step.lower(*args).compile()   # AOT: no collectives yet
        barrier()
        state, metrics = compiled(*args)
    else:
        state, metrics = dp_step(*args)
    return float(metrics["loss"])
