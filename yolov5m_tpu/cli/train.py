"""Training CLI — flag surface of the reference train.py (reference
train.py:16-33) plus TPU-native extras (--dp for data-parallel device count,
--first_out/--image_size for model scaling).

Usage:
  python -m yolov5m_tpu.cli.train --data coco --bs 16 --epochs 273
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time
from pathlib import Path

import numpy as np


def arg_parser():
    p = argparse.ArgumentParser()
    # reference flags (train.py:16-33)
    p.add_argument("--data", type=str, default="coco",
                   help="dataset name under datasets/, or 'synth' for the "
                        "on-device structured synthetic stream (no disk "
                        "I/O; see --synth_steps/--synth_val_batches)")
    p.add_argument("--box_format", type=str, default="coco", choices=["coco", "yolo"])
    p.add_argument("--nosaveimgs", action="store_true")
    p.add_argument("--nosavemodel", action="store_true")
    p.add_argument("--epochs", type=int, default=273)
    p.add_argument("--ultralytics_loss", action="store_true")
    p.add_argument("--nosavelogs", action="store_true")
    p.add_argument("--rect", action="store_true", help="rectangular training")
    p.add_argument("--bs", type=int, default=16)
    p.add_argument("--nw", type=int, default=4,
                   help="loader worker threads (host-side prefetch)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--filename", type=str, default=None)
    p.add_argument("--load_coco_weights", action="store_true",
                   help="bootstrap from a converted torch state dict (--weights)")
    p.add_argument("--weights", type=str, default="yolov5m_coco.npz",
                   help="numpy archive of torch-layout weights for --load_coco_weights")
    p.add_argument("--only_eval", action="store_true")
    # TPU-native extras
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel device count (0 = all available)")
    p.add_argument("--sp", type=int, default=1,
                   help="spatial-partitioning factor: shard the conv grid's "
                        "row axis over this many devices (GSPMD halo "
                        "exchange; composes with --dp on a 2-D mesh; for "
                        "large-canvas training where one image's "
                        "activations exceed a chip)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel factor: shard conv output channels "
                        "over this many devices (GSPMD; composes with --dp "
                        "on a (data, model) mesh; for family variants whose "
                        "params+optimizer exceed one chip)")
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline-parallel stage count: cut the model graph "
                        "into this many stages over a 1-D pipe mesh and "
                        "stream micro-batches GPipe-style; the optimizer "
                        "steps once per loader batch (micro-batching IS the "
                        "accumulation), so use --bs >= 64 for the reference "
                        "nominal-batch recipe")
    p.add_argument("--pp_micro", type=int, default=0,
                   help="PP micro-batches per step (0 = stage count; must "
                        "divide --bs)")
    p.add_argument("--first_out", type=int, default=None,
                   help="width override (default: from --model)")
    p.add_argument("--model", type=str, default="m",
                   choices=["n", "s", "m", "l", "x"],
                   help="YOLOv5 family variant (width+depth scaling; the "
                        "reference hardcodes 'm')")
    p.add_argument("--image_size", type=int, default=640)
    p.add_argument("--max_boxes", type=int, default=None,
                   help="label-array capacity per image (default 120; "
                        "--data synth defaults to 8 — its scene painter "
                        "is static over this count)")
    p.add_argument("--iou_type", type=str, default="giou",
                   choices=["giou", "ciou", "diou", "iou"],
                   help="box regression objective (reference uses GIoU)")
    p.add_argument("--mosaic", type=float, default=0.0,
                   help="mosaic-4 augmentation probability (north-star "
                        "config; the reference has none)")
    p.add_argument("--hsv", action="store_true",
                   help="random HSV gains augmentation")
    p.add_argument("--device_mosaic", action="store_true",
                   help="run mosaic-4 on device as XLA preprocessing "
                        "(ops/mosaic.py; host-parity tested) instead of in "
                        "the host loader; partners sample from the batch")
    p.add_argument("--device_augment", action="store_true",
                   help="run HSV jitter (with --hsv), color jitter and "
                        "horizontal/vertical flips on device as XLA "
                        "preprocessing (ops/augment_device.py; host-parity "
                        "tested) — the host loader keeps rotate + its rare "
                        "cv2 ops; composes with --device_mosaic into one "
                        "jitted program per shape")
    p.add_argument("--multi_scale", type=str, default="auto",
                   help="comma-separated multi-scale sizes (e.g. 512,576,640);"
                        " static jit buckets replacing the reference's random"
                        " per-batch resize. Default 'auto' = {0.8,0.9,1.0}x"
                        " image_size buckets on every non-rect run (512/576/"
                        "640 at 640) — the reference multi-scales non-rect"
                        " training by default (training_utils.py:99-100);"
                        " ignored with --rect")
    p.add_argument("--no_multi_scale", action="store_true",
                   help="train at the fixed image_size only "
                        "(same as --multi_scale off)")
    p.add_argument("--datasets_dir", type=str, default=None,
                   help="override the datasets root (default: ../datasets)")
    p.add_argument("--lr_schedule", type=str, default="constant",
                   choices=["constant", "cosine"],
                   help="constant (reference train.py:61) or warmup+cosine "
                        "(production recipe)")
    p.add_argument("--warmup_epochs", type=float, default=0.0,
                   help="linear lr warmup span in epochs (cosine schedule)")
    p.add_argument("--autoanchor", action="store_true",
                   help="re-fit anchors to the train dataset by k-means when "
                        "the default anchors' best-possible-recall < 0.98 "
                        "(Ultralytics check_anchors; reference uses fixed "
                        "COCO anchors for every dataset)")
    p.add_argument("--label_smoothing", type=float, default=0.0,
                   help="cls BCE label smoothing epsilon (Ultralytics "
                        "smooth_BCE; reference has none)")
    p.add_argument("--focal_gamma", type=float, default=0.0,
                   help="focal-loss gamma for cls/obj BCE (0 = plain BCE)")
    p.add_argument("--no_remat", action="store_true",
                   help="disable the automatic remat at large per-device "
                        "batches (will OOM at bs>=96-equivalent per device "
                        "at 640^2 on v5e)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize C3 stacks in the backward pass "
                        "(trade FLOPs for HBM; enables l/x at 640 batches)")
    p.add_argument("--flat_opt", action="store_true",
                   help="run the optimizer on one raveled vector instead of "
                        "per parameter leaf (measured ~3%% slower on chip — "
                        "kept for resuming checkpoints saved under the "
                        "round-2 flat default)")
    p.add_argument("--no_flat_opt", action="store_true",
                   help=argparse.SUPPRESS)  # legacy no-op (tree is default)
    p.add_argument("--guard_nonfinite", action="store_true",
                   help="skip optimizer updates whose gradients are "
                        "NaN/inf instead of poisoning the params")
    p.add_argument("--confusion", action="store_true",
                   help="write a per-class confusion-matrix CSV next to the "
                        "eval CSVs every epoch")
    p.add_argument("--coco_dump", type=str, default=None,
                   help="directory for COCO-format eval dumps "
                        "(annotations.json + results.json) so the metrics "
                        "can be re-scored externally with pycocotools")
    p.add_argument("--synth_steps", type=int, default=50,
                   help="--data synth: train batches per epoch (generated "
                        "on device, data/synthetic.py)")
    p.add_argument("--synth_val_batches", type=int, default=8,
                   help="--data synth: fixed eval-set size in batches")
    return p.parse_args()


def resolve_dataset(opt):
    """nc/labels from datasets/{data}/data.yaml, falling back to config
    (reference train.py:43-53). `--data synth` has no disk root: the
    loaders are on-device generators (data/synthetic.py SyntheticLoader)."""
    from yolov5m_tpu.config import COCO_LABELS

    if opt.data == "synth":
        return None, len(COCO_LABELS), list(COCO_LABELS)
    if opt.datasets_dir:
        root = os.path.join(opt.datasets_dir, opt.data)
    else:
        parent = Path(os.getcwd())
        root = os.path.join(parent, "datasets", opt.data)
    yaml_path = os.path.join(root, "data.yaml")
    if os.path.isfile(yaml_path):
        import yaml
        with open(yaml_path) as f:
            data = yaml.safe_load(f)
        return root, int(data["nc"]), list(data["names"])
    return root, len(COCO_LABELS), list(COCO_LABELS)


def main(opt):
    import jax
    import jax.numpy as jnp

    from yolov5m_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()

    from yolov5m_tpu.config import ANCHORS, Config
    from yolov5m_tpu.data import get_loaders
    from yolov5m_tpu.eval import Evaluator
    from yolov5m_tpu.models import YOLOv5
    from yolov5m_tpu.models.weights import convert_torch_state_dict
    from yolov5m_tpu.models.yolo import normalized_anchors
    from yolov5m_tpu.ops.decode import decode_predictions
    from yolov5m_tpu.ops.nms import batched_nms
    from yolov5m_tpu.parallel import (
        make_dp_train_step, make_mesh, replicate_state, shard_batch)
    from yolov5m_tpu.train import LossConfig, YoloLoss
    from yolov5m_tpu.train.trainer import (
        accumulation_steps, create_train_state, make_optimizer, make_train_step)
    from yolov5m_tpu.utils import (
        CSVLogger, latest_epoch, load_checkpoint, next_run_name)
    from yolov5m_tpu.utils.checkpoint import AsyncCheckpointer

    from yolov5m_tpu.models.yolo import FAMILY

    root, nc, labels = resolve_dataset(opt)
    if opt.max_boxes is None:
        # synth scenes default to 8 objects (the painter is a static loop
        # over capacity — 120 would be 15x the generator compile for empty
        # slots); disk labels keep the reference-scale 120. An explicit
        # --max_boxes wins on both paths.
        opt.max_boxes = 8 if opt.data == "synth" else 120
    fam_fo, fam_dm = FAMILY[getattr(opt, "model", "m")]
    first_out = opt.first_out if opt.first_out is not None else fam_fo
    cfg = Config(first_out=first_out, nc=nc, image_size=opt.image_size,
                 epochs=opt.epochs, batch_size=opt.bs,
                 max_boxes_per_image=opt.max_boxes,
                 iou_type=getattr(opt, "iou_type", "giou"),
                 guard_nonfinite=getattr(opt, "guard_nonfinite", False),
                 label_smoothing=getattr(opt, "label_smoothing", 0.0),
                 focal_gamma=getattr(opt, "focal_gamma", 0.0),
                 flat_optimizer=getattr(opt, "flat_opt", False))

    # auto-remat at large PER-DEVICE batch: a bs>=96 640^2 backward's
    # activation stash exceeds v5e HBM without rematerialization (measured
    # OOM), and WITH it bs=128 trains 7-37% faster per bucket than bs=64
    # (equal-bucket multi-scale recipe: 497.9 img/s vs 411 —
    # profile_train_scale.py). Remat is exact (grads bit-tested,
    # tests/test_remat.py), so this only trades recompute for memory.
    # HBM pressure is per device: divide by the dp/sp factors so an
    # 8-chip --bs 512 run (64/device) is not penalized; scale by image
    # area so tiny test configs are untouched. --no_remat opts out.
    remat = getattr(opt, "remat", False)
    # same device-count resolution the step-builder below uses (dp=0 = all).
    # TP divides activation memory by the channel-shard factor like SP does
    # by the row factor; PP's per-device stash is stage-local × in-flight
    # micro-batches and doesn't fit this heuristic (use --remat explicitly).
    _sp = max(getattr(opt, "sp", 1), 1)
    _tp = max(getattr(opt, "tp", 1), 1)
    _dp = getattr(opt, "dp", 0) or max(len(jax.devices()) // (_sp * _tp), 1)
    n_shards = _dp * _sp * _tp
    per_device_load = opt.bs * (cfg.image_size / 640.0) ** 2 / n_shards
    if not remat and not getattr(opt, "no_remat", False) \
            and per_device_load >= 96:
        remat = True
        print("==> auto-enabling --remat (>=96 bs-equivalent per device at "
              "this image size needs it to fit HBM, and it measures "
              "faster; --no_remat to opt out)")
    model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16,
                   depth_mult=fam_dm, remat=remat)
    anchors_px = np.asarray(ANCHORS, np.float32)
    if getattr(opt, "autoanchor", False) and opt.data == "synth":
        raise SystemExit("--autoanchor needs a disk dataset to measure "
                         "box statistics; not supported with --data synth")
    if getattr(opt, "autoanchor", False):
        from yolov5m_tpu.data.autoanchor import check_and_fit
        from yolov5m_tpu.data.dataset import DetectionDataset
        aa_ds = DetectionDataset(root, train=True, default_size=cfg.image_size,
                                 bs=opt.bs, bboxes_format=opt.box_format,
                                 max_boxes=opt.max_boxes)
        anchors_px, aa_info = check_and_fit(aa_ds, anchors_px,
                                            image_size=cfg.image_size,
                                            anchor_t=cfg.anchor_t)
        if aa_info["refit"]:
            print(f"==> autoanchor: refit (BPR {aa_info['bpr_default']:.3f} "
                  f"-> {aa_info['bpr_fitted']:.3f}) over "
                  f"{aa_info['n_boxes']} boxes:\n{anchors_px.tolist()}")
        else:
            print(f"==> autoanchor: defaults kept "
                  f"(BPR {aa_info['bpr_default']:.3f})")
    anchors_norm = normalized_anchors(anchors=anchors_px)

    from yolov5m_tpu.data.loaders import default_multiscale_sizes
    ms_opt = getattr(opt, "multi_scale", "auto")
    if getattr(opt, "no_multi_scale", False):
        ms_opt = "off"
    ms_sizes = None
    if not opt.rect and ms_opt not in ("", "off"):
        if ms_opt == "auto":
            ms_sizes = default_multiscale_sizes(opt.image_size)
        else:
            ms_sizes = [int(s) for s in ms_opt.split(",")]
            bad = [s for s in ms_sizes if s % 32]
            # fail at parse time, not hours in when the offending bucket is
            # first drawn: a non-/32 size makes the FPN upsample mismatch
            # its backbone tap (e.g. 600px: 75 at /8 vs 38*2 at /16) and
            # dies in an opaque trace-time shape error
            if bad:
                raise SystemExit(
                    f"--multi_scale sizes must be multiples of 32 "
                    f"(stride of the deepest scale); got {bad}")
    if opt.image_size % 32:
        raise SystemExit(f"--image_size {opt.image_size} must be a "
                         "multiple of 32")
    if ms_sizes:
        print(f"==> multi-scale buckets: {ms_sizes}")
    device_mosaic = getattr(opt, "device_mosaic", False)
    device_augment = getattr(opt, "device_augment", False)
    if opt.rect and (device_mosaic or device_augment):
        # the device augment program only runs on SQUARE batches (the jit
        # guard below skips non-square shapes), so under --rect it would
        # silently never fire — while the host loader had already stripped
        # the augs it was supposed to replace. Keep the augs on the host.
        print("==> --rect batches are non-square: device mosaic/augment "
              "don't apply; keeping host-side augmentation")
        device_mosaic = device_augment = False
    if opt.data == "synth":
        # on-device structured synthetic stream: the full orchestration
        # (epoch loop -> eval -> checkpoint -> resume) with zero host I/O.
        # Device mosaic/augment compose on top like any other batch.
        from yolov5m_tpu.data.synthetic import SyntheticLoader
        train_loader = SyntheticLoader(
            opt.bs, steps=getattr(opt, "synth_steps", 50),
            image_size=opt.image_size, nc=nc, max_boxes=opt.max_boxes,
            multi_scale_sizes=ms_sizes, train=True)
        val_loader = SyntheticLoader(
            opt.bs, steps=getattr(opt, "synth_val_batches", 8),
            image_size=opt.image_size, nc=nc, max_boxes=opt.max_boxes,
            train=False)
        print(f"==> synthetic on-device data: {len(train_loader)} "
              f"train batches/epoch, {len(val_loader)} fixed eval batches")
    else:
        train_loader, val_loader = get_loaders(
            root, opt.bs, rect_training=opt.rect, box_format=opt.box_format,
            max_boxes=opt.max_boxes, default_size=opt.image_size,
            multi_scale_sizes=ms_sizes, num_workers=opt.nw,
            mosaic_p=0.0 if device_mosaic else getattr(opt, "mosaic", 0.0),
            hsv=getattr(opt, "hsv", False) and not device_augment,
            device_augment=device_augment)

    # run naming + resume epoch resolved BEFORE the optimizer: the restored
    # schedule count is (last * opt_steps_per_epoch), so a cosine horizon
    # must span resumed + new epochs or the resumed run sits at the floor
    ckpt_root = "SAVED_CHECKPOINT"
    starting_epoch = 1
    last = None
    if opt.resume:
        filename = opt.filename or "model_1"
        last = latest_epoch(ckpt_root, filename)
        if last is None:
            raise SystemExit(f"--resume: no checkpoints under {ckpt_root}/{filename}")
        starting_epoch = last + 1
    else:
        filename = opt.filename or next_run_name(ckpt_root)

    # anchors persist with the run: a refit (autoanchor) is saved to the
    # run dir and reloaded on --resume, so loss/decode anchors never silently
    # diverge from the ones the checkpoint was trained with
    import json as _json
    anchors_path = os.path.join(ckpt_root, filename, "anchors.json")
    if opt.resume and os.path.isfile(anchors_path):
        with open(anchors_path) as f:
            anchors_px = np.asarray(_json.load(f), np.float32)
        anchors_norm = normalized_anchors(anchors=anchors_px)
        print(f"==> loaded run anchors from {anchors_path}")
    elif not np.array_equal(anchors_px, np.asarray(ANCHORS, np.float32)):
        os.makedirs(os.path.dirname(anchors_path), exist_ok=True)
        with open(anchors_path, "w") as f:
            _json.dump(anchors_px.tolist(), f)
        print(f"==> saved refit anchors to {anchors_path}")

    accumulate = accumulation_steps(opt.bs, cfg.nominal_batch_size)
    if getattr(opt, "pp", 1) > 1:
        # PP fires the optimizer epilogue once per loader batch — its
        # micro-batch stream IS the accumulation (one PP call ≡ M standard
        # calls at accumulate=M, tests/test_pp.py) — so the schedule horizon
        # counts loader batches, not nominal-batch groups
        accumulate = 1
    # schedule horizon in OPTIMIZER steps (accumulation-gated)
    opt_steps_per_epoch = max(len(train_loader) // accumulate, 1)
    if getattr(opt, "lr_schedule", "constant") != "constant":
        cfg = dataclasses.replace(
            cfg, lr_schedule=opt.lr_schedule,
            warmup_steps=int(opt.warmup_epochs * opt_steps_per_epoch))
    total_epochs = (starting_epoch - 1) + opt.epochs
    optimizer = make_optimizer(cfg,
                               total_steps=total_epochs * opt_steps_per_epoch)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               (cfg.image_size, cfg.image_size), optimizer)
    if opt.resume:
        try:
            state = load_checkpoint(state, ckpt_root, filename, last)
        except ValueError:
            # checkpoint was saved under the constant-lr optimizer but we are
            # resuming with a schedule: load against a constant-optimizer
            # template, then graft the schedule count from Adam's step count
            from yolov5m_tpu.train.trainer import upgrade_opt_state_to_schedule
            const_opt = make_optimizer(
                dataclasses.replace(cfg, lr_schedule="constant"))
            tmpl = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                      (cfg.image_size, cfg.image_size),
                                      const_opt)
            loaded = load_checkpoint(tmpl, ckpt_root, filename, last)
            state = loaded.replace(
                opt_state=upgrade_opt_state_to_schedule(loaded.opt_state))
            print("==> upgraded constant-lr checkpoint to the "
                  f"{cfg.lr_schedule} schedule")
        print(f"==> resumed {filename} at epoch {last}")

    if opt.load_coco_weights:
        sd = dict(np.load(opt.weights))
        variables = convert_torch_state_dict(
            sd, {"params": state.params, "batch_stats": state.batch_stats})
        state = state.replace(params=variables["params"],
                              batch_stats=variables["batch_stats"],
                              # copy, not alias: donated steps must not see
                              # the same buffer twice (trainer.py)
                              ema_params=jax.tree.map(
                                  lambda x: jnp.asarray(x).copy(),
                                  variables["params"]))
        print(f"==> loaded converted torch weights from {opt.weights}")

    save_logs = not opt.nosavelogs
    logger = CSVLogger("train_eval_metrics", filename, resume=opt.resume) \
        if save_logs else None

    loss_fn = YoloLoss(LossConfig.from_config(cfg), anchors_px,
                       kind="ultralytics" if opt.ultralytics_loss else "custom")

    n_dev = opt.dp or len(jax.devices())
    n_sp = getattr(opt, "sp", 1)
    n_tp = getattr(opt, "tp", 1)
    n_pp = getattr(opt, "pp", 1)
    assert sum(x > 1 for x in (n_sp, n_tp, n_pp)) <= 1, \
        "--sp/--tp/--pp are mutually exclusive (only --dp composes with " \
        "--sp or --tp on a 2-D mesh)"
    # donate_argnums=0: the loop always rebinds `state`, so the ~6 param-sized
    # state arrays (params, Adam moments, accum grads, EMA) update in place
    # instead of allocating fresh HBM every step
    if n_sp > 1:
        from yolov5m_tpu.parallel import make_sp_mesh, make_sp_train_step
        assert not cfg.flat_optimizer, "--sp does not support --flat_opt"
        n_data = opt.dp or max(len(jax.devices()) // n_sp, 1)
        sp_mesh = make_sp_mesh(n_data=n_data, n_spatial=n_sp)
        step_fn = make_sp_train_step(model, loss_fn, optimizer, sp_mesh,
                                     accumulate,
                                     data_axis="data" if n_data > 1 else None)
        put = lambda b: {k: jnp.asarray(v) for k, v in b.items()}  # noqa: E731
        print(f"==> spatially-partitioned training over a {n_data}x{n_sp} "
              "(data, spatial) mesh")
    elif n_tp > 1:
        from yolov5m_tpu.parallel import (
            make_tp_mesh, make_tp_train_step, shard_state_tp)
        assert not cfg.flat_optimizer, "--tp does not support --flat_opt"
        n_data = opt.dp or max(len(jax.devices()) // n_tp, 1)
        tp_mesh = make_tp_mesh(n_data=n_data, n_model=n_tp)
        step_fn = make_tp_train_step(model, loss_fn, optimizer, tp_mesh,
                                     accumulate,
                                     data_axis="data" if n_data > 1 else None)
        # pre-shard so the donated in-place update path engages from call 1
        state = shard_state_tp(state, tp_mesh)
        put = lambda b: {k: jnp.asarray(v) for k, v in b.items()}  # noqa: E731
        print(f"==> tensor-parallel training over a {n_data}x{n_tp} "
              "(data, model) mesh")
    elif n_pp > 1:
        from yolov5m_tpu.parallel import (
            make_dp_pp_mesh, make_pp_mesh, make_pp_train_step)
        assert not cfg.flat_optimizer, "--pp does not support --flat_opt"
        pp_m = getattr(opt, "pp_micro", 0) or n_pp
        # --dp composes: D data replicas each run the n_pp-stage pipeline
        # on their batch shard (make_dp_pp_mesh). Before this wiring --dp
        # was silently IGNORED next to --pp — chips idled with no warning.
        pp_d = opt.dp if opt.dp and opt.dp > 1 else 1
        assert opt.bs % (pp_m * pp_d) == 0, \
            f"--bs {opt.bs} must be divisible by pp_micro*dp = {pp_m}*{pp_d}"
        pp_mb = opt.bs // (pp_m * pp_d)
        if pp_d > 1:
            pp_mesh = make_dp_pp_mesh(n_data=pp_d, n_pipe=n_pp)
            pp_axis = "data"
        else:
            pp_mesh = make_pp_mesh(n_pipe=n_pp)
            pp_axis = None
        pp_steps = {}  # one compiled pipeline per image shape (multi-scale)

        def step_fn(state, image, labels, mask,
                    _model=model, _loss=loss_fn, _optim=optimizer):
            hw = tuple(image.shape[1:3])
            if hw not in pp_steps:
                pp_steps[hw] = make_pp_train_step(
                    _model, _loss, _optim, pp_mesh, pp_mb, pp_m,
                    image_hw=hw, data_axis=pp_axis)
            return pp_steps[hw](state, image, labels, mask)

        put = lambda b: {k: jnp.asarray(v) for k, v in b.items()}  # noqa: E731
        print(f"==> pipeline-parallel training: {pp_d}x{n_pp} (data, pipe), "
              f"{pp_m} micro-batches of {pp_mb} per replica per step"
              if pp_d > 1 else
              f"==> pipeline-parallel training: {n_pp} stages, "
              f"{pp_m} micro-batches of {pp_mb} per step")
    elif n_dev > 1:
        mesh = make_mesh(n_dev)
        step_fn = make_dp_train_step(model, loss_fn, optimizer, mesh,
                                     accumulate, donate=True,
                                     flat=cfg.flat_optimizer)
        state = replicate_state(state, mesh)
        put = lambda b: shard_batch(b, mesh)  # noqa: E731
        print(f"==> data-parallel over {n_dev} devices")
    else:
        step_fn = jax.jit(make_train_step(model, loss_fn, optimizer, accumulate,
                                          flat=cfg.flat_optimizer),
                          donate_argnums=0)
        put = lambda b: {k: jnp.asarray(v) for k, v in b.items()}  # noqa: E731

    evaluator = Evaluator(model, anchors_norm, cfg, anchors_px)
    checkpointer = AsyncCheckpointer()

    # one jitted program per image shape for ALL device augmentations (key
    # derivation included): eagerly composing random_mosaic_batch would cost
    # ~11 dispatches/step at ~4.1ms each on tunneled transports (CLAUDE.md)
    mosaic_step = None
    if (device_mosaic and getattr(opt, "mosaic", 0.0) > 0) or device_augment:
        from yolov5m_tpu.ops.augment_device import device_augment_batch

        dev_mosaic_p = opt.mosaic if device_mosaic else 0.0
        dev_hsv = bool(getattr(opt, "hsv", False)) and device_augment
        dev_flip = 0.5 if device_augment else 0.0
        # color jitter (reference p=0.4, config.py:41) is elementwise —
        # free on device (dispatch-floor, ROUND4_NOTES §9). Rotate stays
        # on the HOST: its device form is gather-bound (~11x the
        # elementwise floor) and would eat the step; 3.3 ms on one loader
        # core beats that (ops/augment_device.py rotate_batch docstring).
        dev_cj = 0.4 if device_augment else 0.0

        @jax.jit
        def mosaic_step(seed, img, lab, msk):
            key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
            return device_augment_batch(
                key, img, lab, msk, mosaic_p=dev_mosaic_p, hsv=dev_hsv,
                hflip_p=dev_flip, vflip_p=dev_flip, cj_p=dev_cj)

    try:
        for epoch in range(starting_epoch, opt.epochs + starting_epoch):
            train_loader.set_epoch(epoch)  # re-randomize augs/sizes each epoch
            if not opt.only_eval:
                t0 = time.time()
                epoch_loss, nb = 0.0, 0
                t_step = time.time()
                # Per-step float(metrics[...]) would block the host on every step
                # and serialize it with the device pipeline (ruinous over
                # tunneled/remote transports). Instead keep the device-side loss
                # scalars and fetch one stacked chunk per print interval — a
                # single sync per 10 steps, which also bounds host run-ahead.
                chunk = []
                for idx, batch in enumerate(train_loader):
                    b = put(batch)
                    if mosaic_step is not None \
                            and b["image"].shape[1] == b["image"].shape[2]:
                        img, lab, msk = mosaic_step(
                            epoch * 100000 + idx, b["image"], b["labels"],
                            b["mask"])
                        b = {**b, "image": img, "labels": lab, "mask": msk}
                    state, metrics = step_fn(state, b["image"], b["labels"], b["mask"])
                    chunk.append(metrics["loss"])
                    nb += 1
                    if idx % 10 == 0:
                        losses = jax.device_get(jnp.stack(chunk))
                        epoch_loss += float(losses.sum())
                        chunk = []
                        dt = time.time() - t_step
                        ips = 10 * opt.bs / dt if idx else opt.bs / dt
                        t_step = time.time()
                        print(f"epoch {epoch} [{idx}/{len(train_loader)}] "
                              f"loss {float(losses[-1]):.4f} "
                              f"gnorm {float(metrics['grad_norm']):.2f} "
                              f"{ips:.1f} img/s",
                              flush=True)
                    if save_logs and idx % 100 == 0:
                        logger.log_loss(epoch, idx, float(metrics["box"]),
                                        float(metrics["obj"]), float(metrics["cls"]))
                if chunk:
                    epoch_loss += float(jax.device_get(jnp.stack(chunk)).sum())
                print(f"==> epoch {epoch} training_loss: {epoch_loss / max(nb,1):.2f} "
                      f"({time.time()-t0:.0f}s)")

            variables = {"params": state.eval_params, "batch_stats": state.batch_stats}
            cm_path = (os.path.join("train_eval_metrics", filename,
                                    f"confusion_epoch_{epoch}.csv")
                       if getattr(opt, "confusion", False) and save_logs else None)
            results = evaluator.run(
                variables, val_loader,
                coco_dump_dir=getattr(opt, "coco_dump", None), class_names=labels,
                confusion_csv=cm_path)
            print(f"Class accuracy: {results['class_accuracy']*100:.2f}%")
            print(f"Obj accuracy: {results['obj_accuracy']*100:.2f}%")
            print(f"MAP50: {results['map50']:.4f}, MAP75: {results['map75']:.4f}")
            if save_logs:
                logger.log_eval(epoch, results["class_accuracy"],
                                results["obj_accuracy"], results["map50"],
                                results["map75"])

            if not opt.nosaveimgs:
                _dump_prediction_images(model, variables, anchors_norm, cfg,
                                        val_loader, filename, epoch, labels,
                                        decode_predictions, batched_nms, jnp)

            if opt.only_eval:
                # one eval pass, no checkpoint: the reference re-enters the
                # epoch loop N times on --only_eval (train.py:118), re-
                # evaluating identical weights and re-saving hundreds of
                # identical checkpoints that then shift resume's epoch
                # numbering — a bug, not a behavior to reproduce
                print("==> --only_eval: done after one evaluation pass")
                break

            if not opt.nosavemodel:
                # async: on-device snapshot now, fetch+serialize+write on a
                # background thread while the next epoch trains; errors surface
                # on the next save()/the final wait()
                checkpointer.save(state, ckpt_root, filename, epoch,
                                  best_metric=results["map50"])
                print("=> Saving checkpoint (async)...")

    finally:
        # durability: a crash mid-epoch must not lose the previous
        # epoch's in-flight async checkpoint write (the daemon thread
        # dies with the process; join it before unwinding)
        checkpointer.wait()
        # the viz jit closure captures the model + traced constants; drop
        # it with the run so repeated main() calls (test suite, notebooks)
        # don't accumulate one per model instance
        _dump_prediction_images._viz_cache.pop(id(model), None)


def _dump_prediction_images(model, variables, anchors_norm, cfg, val_loader,
                            filename, epoch, labels, decode_predictions,
                            batched_nms, jnp, num_images: int = 5):
    from yolov5m_tpu.utils.plotting import save_prediction_images
    import numpy as _np

    batch = next(iter(val_loader))
    image = jnp.asarray(batch["image"])

    # one jitted graph (an eager forward dispatches per-op — pathologically
    # slow on remote/tunneled backends), cached across epochs so it traces
    # once per model instance
    import jax as _jax

    viz = _dump_prediction_images._viz_cache.get(id(model))
    if viz is None:
        @_jax.jit
        def viz(v, x):
            preds = model.apply(v, x, train=False)
            rows = decode_predictions(preds, jnp.asarray(anchors_norm))
            # visualization thresholds per reference plot_utils.py:82
            return batched_nms(rows, 0.45, 0.25, cfg.max_detections,
                               cfg.pre_nms_topk)
        _dump_prediction_images._viz_cache[id(model)] = viz

    det, valid = viz(variables, image)
    det, valid = _np.asarray(det), _np.asarray(valid)
    h, w = batch["image"].shape[1:3]
    pred_rows, gt_rows = [], []
    for b in range(min(num_images, det.shape[0])):
        pred_rows.append(det[b][valid[b]])
        gt = batch["labels"][b][batch["mask"][b]]
        if len(gt):
            from yolov5m_tpu.ops.boxes import xywhn_to_xyxy_np
            xyxy = xywhn_to_xyxy_np(gt[:, 1:5], w=w, h=h)
            gt_rows.append(_np.concatenate(
                [gt[:, :1], _np.ones((len(gt), 1)), xyxy], axis=1))
        else:
            gt_rows.append(_np.zeros((0, 6), _np.float32))
    n = save_prediction_images(batch["image"], pred_rows, gt_rows,
                               "SAVED_IMAGES", filename, epoch, labels,
                               num_images)
    print(f"=> Saved {n} prediction images")


_dump_prediction_images._viz_cache = {}


def cli():
    """Console-script entry point (pyproject.toml [project.scripts])."""
    main(arg_parser())


if __name__ == "__main__":
    main(arg_parser())
