"""Pytree checkpointing with the reference's run layout.

Parity surface (reference utils/utils.py:56-82, train.py:76-92):
  * per-epoch files under SAVED_CHECKPOINT/{model_N}/checkpoint_epoch_{e}.*
    (msgpack via flax.serialization instead of torch pickles);
  * auto-incrementing run names model_1, model_2, …;
  * resume finds the max epoch in the run folder.

The checkpoint holds the full TrainState (params, batch_stats, optimizer
state, EMA, step) so resume is exact — the reference only saves
model+optimizer (utils/utils.py:56-62).
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization

CKPT_RE = re.compile(r"checkpoint_epoch_(\d+)\.msgpack$")


def _serialize(state: Any) -> bytes:
    """Fetch to host + msgpack-encode (works for sharded/replicated arrays).
    Expensive — hundreds of MB and ~1400 per-leaf fetches over a tunneled
    transport — so callers that write the same state to several paths must
    serialize ONCE and reuse the blob (AsyncCheckpointer.save does)."""
    host_state = jax.tree.map(np.asarray, state)
    return serialization.to_bytes(host_state)


def _write_atomic(out: str, blob: bytes) -> str:
    tmp = out + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, out)  # atomic: no torn checkpoints on preemption
    return out


def save_checkpoint(state: Any, folder_path: str, filename: str, epoch: int) -> str:
    """Serialize a pytree to SAVED_CHECKPOINT-style layout. Returns the path."""
    path = os.path.join(folder_path, filename)
    os.makedirs(path, exist_ok=True)
    return _write_atomic(os.path.join(path, f"checkpoint_epoch_{epoch}.msgpack"),
                         _serialize(state))


def load_checkpoint(template: Any, folder_path: str, filename: str,
                    epoch: int) -> Any:
    """Restore a pytree saved by save_checkpoint into `template`'s structure."""
    path = os.path.join(folder_path, filename, f"checkpoint_epoch_{epoch}.msgpack")
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def latest_epoch(folder_path: str, filename: str) -> Optional[int]:
    """Max epoch with a checkpoint in the run folder (reference train.py:82)."""
    run_dir = os.path.join(folder_path, filename)
    if not os.path.isdir(run_dir):
        return None
    epochs = [int(m.group(1)) for f in os.listdir(run_dir)
              if (m := CKPT_RE.search(f))]
    return max(epochs) if epochs else None


def next_run_name(folder_path: str) -> str:
    """model_1 if none exist, else model_{max+1} (reference train.py:76-92)."""
    if not os.path.isdir(folder_path):
        return "model_1"
    nums = []
    for name in os.listdir(folder_path):
        m = re.fullmatch(r"model_(\d+)", name)
        if m:
            nums.append(int(m.group(1)))
    return f"model_{max(nums) + 1}" if nums else "model_1"


def save_best(state: Any, folder_path: str, filename: str, epoch: int,
              metric: float) -> Optional[str]:
    """Keep a `checkpoint_best.msgpack` (+ sidecar best.txt with epoch and
    metric) updated whenever `metric` improves on the recorded best. Returns
    the path when written, None when not an improvement. No reference
    equivalent (the reference keeps every epoch only)."""
    run_dir = os.path.join(folder_path, filename)
    os.makedirs(run_dir, exist_ok=True)
    if not _best_improves(run_dir, metric):
        return None
    return _commit_best(run_dir, _serialize(state), epoch, metric)


def _best_improves(run_dir: str, metric: float) -> bool:
    marker = os.path.join(run_dir, "best.txt")
    prev = -float("inf")
    if os.path.isfile(marker):
        try:
            prev = float(open(marker).read().split()[1])
        except (IndexError, ValueError):
            pass
    return metric > prev


def _commit_best(run_dir: str, blob: bytes, epoch: int, metric: float) -> str:
    out = _write_atomic(os.path.join(run_dir, "checkpoint_best.msgpack"), blob)
    marker = os.path.join(run_dir, "best.txt")
    with open(marker + ".tmp", "w") as f:
        f.write(f"{epoch} {metric:.6f}\n")
    os.replace(marker + ".tmp", marker)
    return out


class AsyncCheckpointer:
    """Overlap checkpoint persistence with the next epoch's training
    (orbax-style async checkpointing without the dependency).

    save() snapshots the TrainState with an ON-DEVICE copy — the train
    step donates its state buffers, and donation invalidates the ORIGINAL
    arrays, never a copy — then the device→host fetch, serialization, and
    atomic write all run on a background thread while the next epoch
    trains. At most one write is in flight: a second save() (and wait())
    joins the first and re-raises any error it hit. Call wait() once after
    the epoch loop so the last checkpoint is durable before exit.
    """

    def __init__(self):
        import threading
        self._threading = threading
        self._thread: Optional[Any] = None
        self._err: Optional[BaseException] = None
        self._copy_jit = None

    def _snapshot(self, state: Any) -> Any:
        import jax.numpy as jnp

        # ONE jitted program for the whole-tree copy: an eager per-leaf
        # jnp.copy would be ~1400 dispatches at ~4ms each on tunneled
        # transports (CLAUDE.md), blocking the training thread for seconds
        leaves, treedef = jax.tree_util.tree_flatten(state)
        is_arr = [isinstance(x, jax.Array) for x in leaves]
        if self._copy_jit is None:
            self._copy_jit = jax.jit(lambda xs: [jnp.copy(x) for x in xs])
        copied = iter(self._copy_jit([x for x, a in zip(leaves, is_arr) if a]))
        out = [next(copied) if a else x for x, a in zip(leaves, is_arr)]
        return jax.tree_util.tree_unflatten(treedef, out)

    def save(self, state: Any, folder_path: str, filename: str, epoch: int,
             best_metric: Optional[float] = None) -> None:
        """Queue one checkpoint write (and, when best_metric is given, a
        checkpoint_best update) for the given state."""
        self.wait()
        snap = self._snapshot(state)

        def job():
            try:
                # serialize ONCE (the expensive device fetch + msgpack of
                # hundreds of MB) and write the same blob to both paths —
                # the epoch file and, when improved, checkpoint_best
                run_dir = os.path.join(folder_path, filename)
                os.makedirs(run_dir, exist_ok=True)
                blob = _serialize(snap)
                _write_atomic(os.path.join(
                    run_dir, f"checkpoint_epoch_{epoch}.msgpack"), blob)
                if best_metric is not None and _best_improves(run_dir,
                                                              best_metric):
                    best = _commit_best(run_dir, blob, epoch, best_metric)
                    print(f"=> New best mAP50 {best_metric:.4f} -> {best}",
                          flush=True)
            except BaseException as e:  # surfaced by the next wait()/save()
                self._err = e

        self._thread = self._threading.Thread(target=job, daemon=True)
        self._thread.start()

    def wait(self) -> None:
        """Block until the in-flight write (if any) finished; re-raise its
        error."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._err is not None:
            err, self._err = self._err, None
            raise err


def strip_checkpoint(state: Any, keep_ema: bool = True) -> dict:
    """Deployment strip: keep only inference variables, cast params to
    bfloat16 (the reference's strip_model/half analog, utils/utils.py:25-28).
    Returns {'params', 'batch_stats'} suitable for detect/export.
    """
    import jax.numpy as jnp

    params = getattr(state, "ema_params", None) if keep_ema else None
    if params is None:
        params = state.params if hasattr(state, "params") else state["params"]
    stats = state.batch_stats if hasattr(state, "batch_stats") \
        else state["batch_stats"]

    def _cast(x):
        x = np.asarray(x)
        return x.astype(jnp.bfloat16) if x.dtype == np.float32 else x

    return {"params": jax.tree.map(_cast, params),
            "batch_stats": jax.tree.map(_cast, stats)}
