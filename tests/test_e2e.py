"""End-to-end smoke: train CLI for 1 epoch on a tiny synthetic dataset, then
resume, then detect CLI on one image. Exercises loaders, trainer, evaluator,
CSV logging, checkpointing, prediction dumps, and the detect pipeline."""

import json
import os
import sys
import types

import numpy as np
import pytest
from PIL import Image


@pytest.fixture
def dataset_root(tmp_path, rng):
    root = tmp_path / "datasets" / "tiny"
    for split in ("train", "val"):
        os.makedirs(root / "images" / split)
        os.makedirs(root / "labels" / split)
        n = 4 if split == "train" else 2
        for i in range(n):
            w = h = 96
            img = rng.integers(0, 255, (h, w, 3), np.uint8)
            img[20:60, 20:60] = [255, 0, 0]
            Image.fromarray(img).save(root / "images" / split / f"im{i}.jpg")
            (root / "labels" / split / f"im{i}.txt").write_text(
                "20 20 40 40 1\n10 60 30 20 2\n")
    (root / "data.yaml").write_text("nc: 4\nnames: [a, b, c, d]\n")
    return str(tmp_path / "datasets")


def _opt(datasets_dir, **kw):
    base = dict(
        data="tiny", box_format="coco", nosaveimgs=False, nosavemodel=False,
        epochs=1, ultralytics_loss=False, nosavelogs=False, rect=False,
        bs=2, nw=0, resume=False, filename=None, load_coco_weights=False,
        weights="", only_eval=False, dp=1, first_out=8, image_size=64,
        max_boxes=16, datasets_dir=datasets_dir)
    base.update(kw)
    return types.SimpleNamespace(**base)


def test_train_cli_one_epoch_and_resume(dataset_root, tmp_path, monkeypatch):
    from yolov5m_tpu.cli.train import main

    monkeypatch.chdir(tmp_path)
    main(_opt(dataset_root))

    # artifacts: checkpoint, CSVs, prediction images
    ckpt = tmp_path / "SAVED_CHECKPOINT" / "model_1" / "checkpoint_epoch_1.msgpack"
    assert ckpt.is_file()
    loss_csv = (tmp_path / "train_eval_metrics" / "model_1" / "loss.csv").read_text()
    eval_csv = (tmp_path / "train_eval_metrics" / "model_1" / "eval.csv").read_text()
    assert loss_csv.startswith("epoch,batch_idx,box_loss,object_loss,class_loss")
    assert len(loss_csv.strip().splitlines()) >= 2
    assert len(eval_csv.strip().splitlines()) == 2
    imgs = tmp_path / "SAVED_IMAGES" / "model_1" / "EPOCH_1"
    assert len(list(imgs.glob("*.png"))) >= 1

    # resume continues at epoch 2
    main(_opt(dataset_root, resume=True, filename="model_1"))
    assert (tmp_path / "SAVED_CHECKPOINT" / "model_1"
            / "checkpoint_epoch_2.msgpack").is_file()
    eval_csv = (tmp_path / "train_eval_metrics" / "model_1" / "eval.csv").read_text()
    assert len(eval_csv.strip().splitlines()) == 3  # header + 2 epochs


def test_train_cli_sp_training(dataset_root, tmp_path, monkeypatch):
    """--sp 2 --dp 2: spatially-partitioned training on a 2x2 (data,
    spatial) mesh end-to-end through the CLI (GSPMD row sharding;
    image_size=128 keeps >= 2 rows/shard at the P5 grid)."""
    from yolov5m_tpu.cli.train import main

    monkeypatch.chdir(tmp_path)
    main(_opt(dataset_root, dp=2, sp=2, image_size=128, bs=2,
              nosaveimgs=True, filename="sp_run"))
    assert (tmp_path / "SAVED_CHECKPOINT" / "sp_run"
            / "checkpoint_epoch_1.msgpack").is_file()
    eval_csv = (tmp_path / "train_eval_metrics" / "sp_run"
                / "eval.csv").read_text()
    assert len(eval_csv.strip().splitlines()) == 2


def test_train_cli_tp_training(dataset_root, tmp_path, monkeypatch):
    """--tp 2 --dp 2: tensor-parallel training on a 2x2 (data, model) mesh
    end-to-end through the CLI (GSPMD channel sharding; first_out=8 keeps
    every conv width divisible by the model-axis size)."""
    from yolov5m_tpu.cli.train import main

    monkeypatch.chdir(tmp_path)
    main(_opt(dataset_root, dp=2, tp=2, bs=2,
              nosaveimgs=True, filename="tp_run"))
    assert (tmp_path / "SAVED_CHECKPOINT" / "tp_run"
            / "checkpoint_epoch_1.msgpack").is_file()
    eval_csv = (tmp_path / "train_eval_metrics" / "tp_run"
                / "eval.csv").read_text()
    assert len(eval_csv.strip().splitlines()) == 2


def test_train_cli_pp_training(dataset_root, tmp_path, monkeypatch):
    """--pp 2: GPipe pipeline training (2 stages, 2 micro-batches of 1)
    end-to-end through the CLI on the virtual mesh."""
    from yolov5m_tpu.cli.train import main

    monkeypatch.chdir(tmp_path)
    main(_opt(dataset_root, pp=2, bs=2,
              nosaveimgs=True, filename="pp_run"))
    assert (tmp_path / "SAVED_CHECKPOINT" / "pp_run"
            / "checkpoint_epoch_1.msgpack").is_file()
    eval_csv = (tmp_path / "train_eval_metrics" / "pp_run"
                / "eval.csv").read_text()
    assert len(eval_csv.strip().splitlines()) == 2


def test_train_cli_only_eval(dataset_root, tmp_path, monkeypatch):
    from yolov5m_tpu.cli.train import main

    monkeypatch.chdir(tmp_path)
    main(_opt(dataset_root, only_eval=True, nosaveimgs=True, nosavemodel=True,
              nosavelogs=True, filename="eval_run"))
    assert not (tmp_path / "SAVED_CHECKPOINT" / "eval_run").exists()


def test_detect_cli(dataset_root, tmp_path, monkeypatch, rng):
    from yolov5m_tpu.cli import detect

    monkeypatch.chdir(tmp_path)
    img_path = tmp_path / "test.jpg"
    Image.fromarray(rng.integers(0, 255, (120, 160, 3), np.uint8)).save(img_path)

    opt = types.SimpleNamespace(
        checkpoint=None, weights=None, img=str(img_path), nc=4,
        labels="a,b,c,d", first_out=8, image_size=64, conf=0.25, iou=0.45,
        save_pred=True, out=str(tmp_path / "detections_exp"))
    detect.main(opt)
    outs = list((tmp_path / "detections_exp").glob("*_pred.png"))
    assert len(outs) == 1


def test_detect_cli_batched_dir(tmp_path, monkeypatch, rng):
    """--img_dir --all: batched directory mode (uint8 device ingress,
    pad-to-batch, per-image unletterboxed detections.json)."""
    from yolov5m_tpu.cli import detect

    monkeypatch.chdir(tmp_path)
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    for i, shape in enumerate(((90, 120, 3), (70, 50, 3), (64, 64, 3))):
        Image.fromarray(rng.integers(0, 255, shape, np.uint8)).save(
            img_dir / f"im{i}.jpg")

    opt = types.SimpleNamespace(
        checkpoint=None, weights=None, img=None, img_dir=str(img_dir),
        all=True, bs=2, nc=4, labels="a,b,c,d", first_out=8, image_size=64,
        conf=0.01, iou=0.45, save_pred=True, out=str(tmp_path / "dets"))
    detect.main(opt)
    with open(tmp_path / "dets" / "detections.json") as f:
        results = json.load(f)
    assert set(results) == {"im0.jpg", "im1.jpg", "im2.jpg"}
    assert any(len(v) for v in results.values()), "no detections at conf=0.01"
    # boxes are in ORIGINAL-image coordinates
    for r in results["im0.jpg"]:
        x1, y1, x2, y2 = r["box_xyxy"]
        assert 0 <= x1 <= x2 <= 120 + 1 and 0 <= y1 <= y2 <= 90 + 1
    assert len(list((tmp_path / "dets").glob("*_pred.png"))) == 3


def test_train_cli_rect_and_ultralytics_loss(dataset_root, tmp_path, monkeypatch):
    """Rectangular batching + ultralytics loss through the full CLI path."""
    from yolov5m_tpu.cli.train import main

    monkeypatch.chdir(tmp_path)
    main(_opt(dataset_root, rect=True, ultralytics_loss=True,
              nosaveimgs=True, filename="rect_run"))
    ckpt = tmp_path / "SAVED_CHECKPOINT" / "rect_run" / "checkpoint_epoch_1.msgpack"
    assert ckpt.is_file()
    eval_csv = (tmp_path / "train_eval_metrics" / "rect_run" / "eval.csv").read_text()
    assert len(eval_csv.strip().splitlines()) == 2


def test_default_multiscale_buckets():
    """Non-rect training multi-scales BY DEFAULT, like the reference
    (training_utils.py:99-100): at 640 the auto buckets are [512, 576, 640];
    tiny sizes collapse to a single bucket and disable multi-scale."""
    from yolov5m_tpu.data.loaders import default_multiscale_sizes

    assert default_multiscale_sizes(640) == [512, 576, 640]
    assert default_multiscale_sizes(320) == [256, 288, 320]
    assert default_multiscale_sizes(64) is None   # collapses → off
    for s in default_multiscale_sizes(640):
        assert s % 32 == 0


def test_train_cli_mosaic_hsv_multiscale(dataset_root, tmp_path, monkeypatch):
    """Mosaic + HSV + multi-scale buckets through the CLI."""
    from yolov5m_tpu.cli.train import main

    opt = _opt(dataset_root, nosaveimgs=True, nosavemodel=True,
               nosavelogs=True, filename="aug_run")
    opt.mosaic = 0.5
    opt.hsv = True
    opt.multi_scale = "64,96"
    monkeypatch.chdir(tmp_path)
    main(opt)  # completes without error; loss finite is asserted inside step


def test_train_cli_device_mosaic(dataset_root, tmp_path, monkeypatch):
    """--device_mosaic: mosaic-4 runs on device as XLA preprocessing."""
    from yolov5m_tpu.cli.train import main

    opt = _opt(dataset_root, nosaveimgs=True, nosavemodel=True,
               nosavelogs=True, filename="dm_run")
    opt.mosaic = 1.0
    opt.device_mosaic = True
    monkeypatch.chdir(tmp_path)
    main(opt)


def test_train_cli_device_augment(dataset_root, tmp_path, monkeypatch):
    """--device_augment: mosaic + HSV + flips all on device in one jitted
    step (host loader's flips/HSV disabled)."""
    from yolov5m_tpu.cli.train import main

    opt = _opt(dataset_root, nosaveimgs=True, nosavemodel=True,
               nosavelogs=True, filename="da_run")
    opt.mosaic = 1.0
    opt.hsv = True
    opt.device_mosaic = True
    opt.device_augment = True
    monkeypatch.chdir(tmp_path)
    main(opt)


def test_train_cli_synth_data_cycle(tmp_path, monkeypatch):
    """--data synth: the full orchestration (epoch -> eval -> checkpoint ->
    --resume -> eval) over the on-device SyntheticLoader stream — no
    dataset on disk at all. The flagship-scale run of this exact path is
    logged in logs/flagship_cycle/; this pins the wiring in the suite."""
    from yolov5m_tpu.cli.train import main

    monkeypatch.chdir(tmp_path)
    kw = dict(data="synth", synth_steps=2, synth_val_batches=1,
              image_size=64, bs=2, first_out=8, max_boxes=8,
              filename="model_1")
    main(_opt(None, **kw))

    ckpt = tmp_path / "SAVED_CHECKPOINT" / "model_1" / "checkpoint_epoch_1.msgpack"
    assert ckpt.is_file()
    eval_csv = (tmp_path / "train_eval_metrics" / "model_1" / "eval.csv").read_text()
    assert len(eval_csv.strip().splitlines()) == 2

    main(_opt(None, resume=True, **kw))
    assert (tmp_path / "SAVED_CHECKPOINT" / "model_1"
            / "checkpoint_epoch_2.msgpack").is_file()
    eval_csv = (tmp_path / "train_eval_metrics" / "model_1" / "eval.csv").read_text()
    assert len(eval_csv.strip().splitlines()) == 3
