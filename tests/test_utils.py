"""Checkpoint/resume, run naming, CSV logging, plotting tests."""

import os

import numpy as np
import jax.numpy as jnp

from yolov5m_tpu.utils.checkpoint import (
    latest_epoch, load_checkpoint, next_run_name, save_checkpoint)
from yolov5m_tpu.utils.logging import CSVLogger
from yolov5m_tpu.utils.plotting import save_prediction_images


def _state(v=1.0):
    return {"params": {"w": jnp.full((3, 3), v)}, "step": jnp.asarray(7)}


def test_checkpoint_roundtrip(tmp_path):
    state = _state(2.5)
    p = save_checkpoint(state, str(tmp_path), "model_1", epoch=3)
    assert os.path.isfile(p)
    restored = load_checkpoint(_state(0.0), str(tmp_path), "model_1", 3)
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), 2.5)
    assert int(restored["step"]) == 7


def test_async_checkpointer_matches_sync_and_survives_donation(tmp_path):
    """AsyncCheckpointer must snapshot before returning: a donated jit call
    that invalidates the original buffers right after save() must not
    corrupt the written checkpoint."""
    import jax
    from yolov5m_tpu.utils.checkpoint import AsyncCheckpointer

    state = {"params": {"w": jnp.full((64, 64), 3.25)},
             "step": jnp.asarray(11)}
    ck = AsyncCheckpointer()
    ck.save(state, str(tmp_path), "model_1", epoch=1, best_metric=0.5)

    # immediately clobber the original buffers via donation
    bump = jax.jit(lambda s: jax.tree.map(lambda x: x * 0 - 1, s),
                   donate_argnums=0)
    state = bump(state)
    jax.block_until_ready(state)

    ck.wait()
    restored = load_checkpoint(
        {"params": {"w": jnp.zeros((64, 64))}, "step": jnp.asarray(0)},
        str(tmp_path), "model_1", 1)
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), 3.25)
    assert int(restored["step"]) == 11
    # best checkpoint written too (best_metric improved over nothing)
    assert os.path.isfile(os.path.join(tmp_path, "model_1",
                                       "checkpoint_best.msgpack"))


def test_async_checkpointer_surfaces_errors(tmp_path):
    import pytest
    from yolov5m_tpu.utils.checkpoint import AsyncCheckpointer

    blocker = tmp_path / "model_x"
    blocker.write_text("a file where the run DIRECTORY must go")
    ck = AsyncCheckpointer()
    ck.save(_state(), str(tmp_path), "model_x", epoch=1)
    with pytest.raises(OSError):
        ck.wait()
    ck.wait()  # error is consumed, not re-raised forever


def test_latest_epoch_and_resume(tmp_path):
    assert latest_epoch(str(tmp_path), "model_1") is None
    for e in (1, 2, 5):
        save_checkpoint(_state(float(e)), str(tmp_path), "model_1", e)
    assert latest_epoch(str(tmp_path), "model_1") == 5
    restored = load_checkpoint(_state(), str(tmp_path), "model_1", 5)
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), 5.0)


def test_next_run_name(tmp_path):
    assert next_run_name(str(tmp_path)) == "model_1"
    os.makedirs(tmp_path / "model_1")
    os.makedirs(tmp_path / "model_3")
    os.makedirs(tmp_path / "junk")
    assert next_run_name(str(tmp_path)) == "model_4"


def test_csv_logger_schemas(tmp_path):
    log = CSVLogger(str(tmp_path), "model_1")
    log.log_loss(1, 0, 0.0451, 1.2191, 0.3826)
    log.log_eval(1, 0.71234, 0.912, 0.55, 0.31)
    loss_lines = (tmp_path / "model_1" / "loss.csv").read_text().strip().splitlines()
    eval_lines = (tmp_path / "model_1" / "eval.csv").read_text().strip().splitlines()
    # identical schemas to the reference CSVs (loss.py:58, validation_utils.py:30)
    assert loss_lines[0] == "epoch,batch_idx,box_loss,object_loss,class_loss"
    assert eval_lines[0] == "epoch,class_accuracy,obj_accuracy,map50,map75"
    assert loss_lines[1].startswith("1,0,0.0451")
    assert eval_lines[1] == "1,0.712,0.912,0.55,0.31"


def test_csv_logger_resume_appends(tmp_path):
    log = CSVLogger(str(tmp_path), "m")
    log.log_eval(1, 0.5, 0.5, 0.1, 0.1)
    log2 = CSVLogger(str(tmp_path), "m", resume=True)
    log2.log_eval(2, 0.6, 0.6, 0.2, 0.2)
    lines = (tmp_path / "m" / "eval.csv").read_text().strip().splitlines()
    assert len(lines) == 3  # header + 2 rows


def test_save_prediction_images(tmp_path, rng):
    imgs = rng.uniform(0, 1, (3, 64, 64, 3)).astype(np.float32)
    rows = [np.array([[0, 0.9, 5, 5, 30, 30]], np.float32)] * 3
    n = save_prediction_images(imgs, rows, rows, str(tmp_path), "model_1",
                               epoch=2, num_images=2)
    assert n == 2
    out = tmp_path / "model_1" / "EPOCH_2"
    assert sorted(os.listdir(out)) == ["image_0.png", "image_1.png"]


def test_strip_checkpoint_bf16():
    from yolov5m_tpu.utils.checkpoint import strip_checkpoint

    state = {"params": {"w": jnp.ones((4, 4), jnp.float32)},
             "batch_stats": {"m": jnp.zeros((4,), jnp.float32)},
             "opt_state": {"big": jnp.zeros((100,))}}
    stripped = strip_checkpoint(state, keep_ema=False)
    assert set(stripped) == {"params", "batch_stats"}
    assert np.asarray(stripped["params"]["w"]).dtype == np.dtype("bfloat16")


def test_save_best_tracks_improvements(tmp_path):
    from yolov5m_tpu.utils.checkpoint import load_checkpoint, save_best

    state = {"w": np.arange(4, dtype=np.float32)}
    assert save_best(state, str(tmp_path), "run", 1, 0.40) is not None
    # regression: not saved
    state2 = {"w": np.full(4, 9.0, np.float32)}
    assert save_best(state2, str(tmp_path), "run", 2, 0.30) is None
    # improvement: overwrites
    state3 = {"w": np.full(4, 7.0, np.float32)}
    path = save_best(state3, str(tmp_path), "run", 3, 0.55)
    assert path is not None
    from flax import serialization
    with open(path, "rb") as f:
        best = serialization.from_bytes({"w": np.zeros(4, np.float32)}, f.read())
    np.testing.assert_array_equal(best["w"], state3["w"])
    marker = (tmp_path / "run" / "best.txt").read_text().split()
    assert marker[0] == "3" and abs(float(marker[1]) - 0.55) < 1e-6
