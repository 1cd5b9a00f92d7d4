"""Host data-plane cost per image, single-threaded, + feed arithmetic.

VERDICT r3 Missing #3: prove (or bound) that the host pipeline can feed the
~498 img/s train recipe. This box has ONE CPU core (CLAUDE.md), so no
threading here — we measure per-image single-thread cost of each host
stage and commit the cores-needed arithmetic for realistic TPU hosts
(TPU-v5e hosts expose 112+ vCPUs; even a tiny v5e-1 slice VM has 24).

Stages measured (the full host path of cli/train.py's loader):
  decode    native libjpeg decode (data/native.py decode_jpeg, GIL-free)
  letterbox native resize+pad to 640² (data/native.py letterbox)
  augment   residual HOST augments at reference probabilities
            (data/augment.py TrainAugment: jitter/flip/rotate/blur/CLAHE/
            posterize/shuffle — mosaic+HSV already run ON DEVICE)
  pad       label padding to (max_boxes, 5) (data/dataset.py)

Output: per-stage ms/image over N iterations on two source sizes, images/
sec/core for the full chain, and cores needed for TRAIN_TARGET img/s.
"""

import io
import time

import numpy as np

TRAIN_TARGET = 498.0    # img/s, the bs128+remat multi-scale recipe
N = 60


def make_jpeg(h, w, seed=0, quality=90):
    from PIL import Image
    rng = np.random.default_rng(seed)
    # structured-ish content: smooth gradients + blocks, so JPEG entropy is
    # realistic (pure noise over-states decode cost ~2x)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(yy * 255 / h), (xx * 255 / w),
                    ((yy + xx) * 127 / (h + w))], -1).astype(np.uint8)
    for _ in range(12):
        y, x = rng.integers(0, h - 40), rng.integers(0, w - 40)
        img[y:y + 40, x:x + 40] = rng.integers(0, 255, 3)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def bench_stage(fn, n=N):
    fn()                                   # warm
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1e3   # ms/img


def main():
    from yolov5m_tpu.data.augment import TrainAugment
    from yolov5m_tpu.data.native import (decode_jpeg, letterbox,
                                         native_available)

    print(f"native kernels available: {native_available()}")
    for (h, w) in ((480, 640), (960, 1280)):
        blob = make_jpeg(h, w)
        img = decode_jpeg(blob)
        assert img is not None and img.shape == (h, w, 3)
        lb = lambda: letterbox(img, (640, 640))
        boxed = lb()[0]
        aug = TrainAugment(seed=0)
        labels = np.asarray([[1, .5, .5, .2, .3], [3, .3, .7, .1, .2],
                             [0, .7, .3, .15, .25]], np.float32)
        f32 = boxed.astype(np.float32)

        # residual host augment under --device_augment: color jitter and
        # flips moved on device (ops/augment_device.py), host keeps
        # rotate + the rare cv2 ops — mirrors data/loaders.py
        aug_dev = TrainAugment(seed=0, hflip_p=0.0, vflip_p=0.0,
                               color_jitter_p=0.0)

        t_dec = bench_stage(lambda: decode_jpeg(blob))
        t_lb = bench_stage(lb)
        # production pays ONE u8->f32 conversion per image (data/dataset.py
        # returns img.astype(np.float32)); time it as its own stage. The
        # augment lambdas need a fresh input per call (augments mutate), so
        # they pay an f32 copy per iteration that production does NOT — net
        # it out with a measured copy cost so t_aug is the augment alone.
        t_f32 = bench_stage(lambda: boxed.astype(np.float32))
        t_copy = bench_stage(lambda: f32.copy())
        # clamp netted stage times at 0: when the residual augment costs
        # less than (or about) the copy itself, the subtraction goes
        # negative/noisy — report 0 and say the clamp fired
        t_aug_raw = bench_stage(lambda: aug(f32.copy(), labels, 0)) - t_copy
        t_aug_dev_raw = bench_stage(
            lambda: aug_dev(f32.copy(), labels, 0)) - t_copy
        clamped = [n for n, t in (("augment", t_aug_raw),
                                  ("augment-dev", t_aug_dev_raw)) if t < 0]
        t_aug = max(0.0, t_aug_raw)
        t_aug_dev = max(0.0, t_aug_dev_raw)
        if clamped:
            print(f"  [note] netted stage(s) {clamped} measured below the "
                  "f32-copy cost; clamped to 0 (below measurement noise)")
        pad = lambda: np.concatenate(
            [labels, np.zeros((8 - len(labels), 5), np.float32)])
        t_pad = bench_stage(pad)

        total = t_dec + t_lb + t_f32 + t_aug + t_pad
        total_dev = t_dec + t_lb + t_f32 + t_aug_dev + t_pad
        print(f"\nsource {w}x{h} -> 640x640  (ms/image, 1 thread)")
        print(f"  decode    {t_dec:7.2f}")
        print(f"  letterbox {t_lb:7.2f}")
        print(f"  to f32    {t_f32:7.2f}")
        print(f"  augment   {t_aug:7.2f}   (--device_augment residual: "
              f"{t_aug_dev:.2f}; measured f32-copy overhead "
              f"{t_copy:.2f} netted out)")
        print(f"  label pad {t_pad:7.3f}")
        print(f"  TOTAL     {total:7.2f}  -> {1e3 / total:7.1f} img/s/core")
        print(f"  cores to feed {TRAIN_TARGET:.0f} img/s: "
              f"{TRAIN_TARGET * total / 1e3:.1f}   (--device_augment: "
              f"{TRAIN_TARGET * total_dev / 1e3:.1f}, "
              f"{1e3 / total_dev:.0f} img/s/core)")


if __name__ == "__main__":
    main()
