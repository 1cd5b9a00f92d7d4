"""Headline benchmark: 640x640 batch inference images/sec/chip including NMS.

Matches the north-star metric (BASELINE.json): YOLOv5m (first_out=48, 80
classes) forward + decode + class-aware NMS, all on-device in one jit.
`vs_baseline` is the ratio against the 2x-A100 target: we take ~300 img/s as
a plain-PyTorch A100 yolov5m 640 batch-inference figure, so target = 600
img/s and vs_baseline = value / 600 (>1.0 beats the target).

Measurement protocol (pre-registered, value-independent — no early stop
conditioned on hitting the target, no max-selection):

  * the pipeline runs as SEVERAL distinct jitted arm programs (NMS backend
    variants of the same fused pipeline), interleaved per round. This shape
    is required to be served the relay's fast lane at all: processes that
    loop a single jitted program are throttled to ~2-4%% of chip speed
    regardless of chip state (ROUND2_NOTES.md forensics, reproduced across
    dozens of runs);
  * the HEADLINE value is the MEDIAN round of the arm whose backend is the
    shipped auto-selected default (ops/nms.py resolve_backend) over a fixed
    time budget, after a fixed 2-round untimed warmup. Max and per-arm
    medians are reported as auxiliary fields only;
  * timed iterations are dependency-chained through a device-side scalar
    accumulator and the final scalar is fetched inside the timed window —
    one fetch proves the whole chain executed (`block_until_ready` has been
    observed returning early on this relay). Accumulators are monotone
    across all rounds so no call is ever a byte-identical replay a
    result-caching relay could serve without executing;
  * inputs are several distinct device-resident batches, generated on
    device (uploads of many 640^2 batches over the tunnel take minutes).

Health / lane accounting: `single_program_lane_tflops` is a bf16 matmul
probe that, being itself a single-program loop, measures the THROTTLED lane
(~10 TFLOP/s) — it is reported for lane forensics, not as a chip-health
verdict. The pipeline rounds themselves are the chip-capability signal;
`relay_lane_observed` summarizes whether any measured round reached the
fast lane. A median far below the ledger's fast-lane values with
`relay_lane_observed: "slow"` means the capture landed in a throttled
window, not that the pipeline got slower.

Prints exactly one JSON line.
"""

import json
import os
import statistics
import time

import jax
import jax.numpy as jnp

from yolov5m_tpu.config import Config
from yolov5m_tpu.models import YOLOv5
from yolov5m_tpu.models.fuse import fold_batchnorm
from yolov5m_tpu.models.yolo import normalized_anchors
from yolov5m_tpu.ops.nms import resolve_backend
from yolov5m_tpu.ops.postprocess import fused_detect

A100_TARGET_IMG_S = 600.0  # 2x ~300 img/s (plain-torch A100 yolov5m batch inference)
_HERE = os.path.dirname(os.path.abspath(__file__))


def run_matmul_probe() -> dict:
    """bf16 matmul-chain probe (benchmarks/healthcheck.py), quiet. NOTE: a
    single-program loop — on this relay it measures the throttled
    single-program lane, not chip capability (see module docstring). Runs
    in a SUBPROCESS so the probe's single-program execution history cannot
    color the relay lane state of the measurement process."""
    import subprocess
    import sys
    code = (
        "import importlib.util, json, jax;"
        "spec = importlib.util.spec_from_file_location('healthcheck', %r);"
        "m = importlib.util.module_from_spec(spec);"
        "spec.loader.exec_module(m);"
        "r = (m.main(n=512, iters=2, verbose=False)"
        "     if jax.devices()[0].platform == 'cpu'"
        "     else m.main(verbose=False));"
        "print('PROBE::' + json.dumps(r))"
        % os.path.join(_HERE, "benchmarks", "healthcheck.py"))
    try:
        out = subprocess.run([sys.executable, "-c", code], timeout=240,
                             capture_output=True, text=True)
        for line in out.stdout.splitlines():
            if line.startswith("PROBE::"):
                return json.loads(line[len("PROBE::"):])
    except Exception:
        pass
    return {}


def main(batch_size: int = 128, warmup_rounds: int = 2) -> None:
    # persistent compile cache: repeated bench runs (the driver's included)
    # skip the multi-minute remote compile of the full pipeline
    from yolov5m_tpu.utils.misc import enable_compile_cache
    enable_compile_cache(os.path.join(_HERE, ".jax_cache"))

    cfg = Config()
    base = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = fold_batchnorm(
        base.init(rng, jnp.zeros((1, 640, 640, 3), jnp.float32)))
    model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16,
                   fused=True)
    anchors = jnp.asarray(normalized_anchors())

    # Each arm scans CHAIN_LEN distinct batches inside ONE jit: host→device
    # dispatch over this relay costs ~4.1ms per call regardless of payload
    # (benchmarks/profile_dispatch.py — a trivial 64-element program takes
    # 4.14ms), so driving the pipeline batch-by-batch donates ~8% of the
    # round to transport. The on-device scan is the production serving shape
    # (one dispatch, many batches) and measured 1365 vs 1198 img/s.
    # batch_size=128 is the measured throughput optimum (round-3 sweep,
    # benchmarks/profile_batchsize.py: 1480 img/s vs 1221 at bs=64 —
    # better MXU batch tiling on the early low-channel convs); CHAIN_LEN
    # keeps 256 images per call so dispatch amortization and HBM footprint
    # stay constant across batch sizes.
    CHAIN_LEN = max(256 // batch_size, 1)

    def make_arm(backend):
        @jax.jit
        def arm(xs, acc):
            # acc folds into each input so iteration i+1 depends on i and
            # call j+1 depends on call j: one final scalar fetch proves the
            # whole chain executed
            def body(acc, x):
                preds = model.apply(variables,
                                    x + (acc * 0).astype(x.dtype),
                                    train=False)
                det, valid = fused_detect(
                    preds, anchors, conf_threshold=0.25,
                    iou_threshold=cfg.nms_iou_thresh,
                    max_detections=cfg.max_detections,
                    # serving config: K scales with the 0.25 conf gate
                    # (cfg.topk_for_conf docstring; ~5% e2e win, lossless
                    # at serving confidence)
                    pre_nms_topk=cfg.topk_for_conf(0.25),
                    backend=backend)
                return acc + valid.sum().astype(jnp.float32), ()
            acc, _ = jax.lax.scan(body, acc, xs)
            return acc
        return arm

    # the shipped default backend resolves per platform (pallas on TPU);
    # its arm is the HEADLINE arm. The others ride along both as lane
    # carriers (multi-program shape) and as an A/B record.
    default_backend = resolve_backend("auto", cfg.topk_for_conf(0.25))
    backends = ["xla", "xla_loop"]
    if default_backend not in backends:
        backends.insert(0, default_backend)
    arms = {b: make_arm(b) for b in backends}

    # distinct device-resident batches, generated on device, stacked into
    # CHAIN_LEN-deep scan inputs
    gen = jax.jit(lambda k: jax.random.uniform(
        k, (CHAIN_LEN, batch_size, 640, 640, 3), jnp.float32))
    xs = [gen(jax.random.PRNGKey(i)) for i in range(2)]
    jax.block_until_ready(xs)

    accs = {}
    for name, arm in arms.items():
        a = arm(xs[0], jnp.float32(0.0))
        float(a)                         # compile + warm
        accs[name] = a

    # 2 async-enqueued scan calls per timed segment, ONE scalar fetch at the
    # end: back-to-back enqueue lets the device run call j+1 immediately
    # after call j (the host sync per call otherwise serializes a full
    # relay round-trip into every segment — profile_dispatch.py measured
    # 1365 vs 1198 img/s for exactly this difference). The fetch still
    # proves the whole chain ran: call 2 depends on call 1 via acc.
    SEG_CALLS = 2
    max_seconds = float(os.environ.get("BENCH_MAX_SECONDS", "900"))
    max_rounds = int(os.environ.get("BENCH_MAX_ROUNDS", "2000"))
    deadline = time.time() + max_seconds
    per_arm = {b: [] for b in backends}   # img/s per measured round
    k = 0
    n_round = 0
    while n_round < warmup_rounds + max_rounds:
        for name, arm in arms.items():
            acc = accs[name]
            t0 = time.perf_counter()
            for _ in range(SEG_CALLS):
                acc = arm(xs[k % len(xs)], acc)
                k += 1
            assert float(acc) >= 0.0  # scalar fetch: forces the chain
            dt = time.perf_counter() - t0
            accs[name] = acc
            if n_round >= warmup_rounds:   # fixed warmup, value-independent
                per_arm[name].append(
                    batch_size * CHAIN_LEN * SEG_CALLS / dt)
            # deadline checked between ARMS too: in a degraded chip window a
            # single arm segment can take minutes, and overrunning the
            # budget by a whole round risks the caller's own process timeout
            # (observed 2026-08-18: a 900s-budget run exceeded 30 min)
            if time.time() > deadline and per_arm[default_backend]:
                break
        n_round += 1
        # honor the deadline only once at least ONE measured round of the
        # headline arm exists: on a degraded window where warmup alone eats
        # the budget, an empty capture would crash the median below and
        # print no JSON at all
        if time.time() > deadline and per_arm[default_backend]:
            break

    # lane-forensics probe AFTER measurement (subprocess; a hung probe must
    # not eat the measurement budget)
    if os.environ.get("BENCH_SKIP_PROBE"):
        probe = {}
    else:
        probe = run_matmul_probe()

    default_rounds = per_arm[default_backend]
    img_s = statistics.median(default_rounds)
    fast_seen = any(r >= A100_TARGET_IMG_S for rs in per_arm.values()
                    for r in rs)
    out = {
        "metric": "640x640 images/sec/chip incl. NMS (bs=%d, bf16, fused "
                  "postprocess, %s NMS backend)" % (batch_size,
                                                    default_backend),
        "value": round(img_s, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_s / A100_TARGET_IMG_S, 3),
        "protocol": "median round of the default-backend arm over a fixed "
                    "%ds budget, %d-round untimed warmup, no "
                    "value-conditioned stopping; one round = %d async-"
                    "enqueued lax.scan calls per arm, each scanning %d "
                    "distinct chained bs=%d batches on device, one scalar "
                    "fetch per segment (host dispatch costs ~4.1ms/call on "
                    "this relay and a per-call sync serializes a full "
                    "round-trip — profile_dispatch.py)" % (
                        int(max_seconds), warmup_rounds, SEG_CALLS,
                        CHAIN_LEN, batch_size),
        "rounds_measured": len(default_rounds),
        "max_round": round(max(default_rounds), 2) if default_rounds else None,
        "p25_round": round(statistics.quantiles(default_rounds, n=4)[0], 2)
        if len(default_rounds) >= 4 else None,
        "per_arm_median": {b: round(statistics.median(r), 2)
                           for b, r in per_arm.items() if r},
        "relay_lane_observed": "fast" if fast_seen else "slow",
        "single_program_lane_tflops": probe.get("matmul_tflops"),
        "device": probe.get("device"),
        "note": "the relay throttles single-program processes to ~2-4% of "
                "chip speed per-process for long stretches; the matmul "
                "probe is such a loop and reads the throttled lane. "
                "relay_lane_observed says whether the interleaved pipeline "
                "rounds reached the fast lane during this capture. See "
                "ROUND2_NOTES.md forensics + BENCH_OBSERVATIONS.jsonl.",
    }

    # Observation ledger: append-only forensic record of every run of this
    # script on real hardware (committed periodically for provenance).
    ledger = os.path.join(_HERE, "BENCH_OBSERVATIONS.jsonl")
    if jax.devices()[0].platform != "cpu":
        try:
            with open(ledger, "a") as f:
                f.write(json.dumps({
                    "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                    "value": out["value"],
                    "vs_baseline": out["vs_baseline"],
                    "max_round": out["max_round"],
                    "rounds": out["rounds_measured"],
                    "lane": out["relay_lane_observed"],
                    "single_program_lane_tflops":
                        out["single_program_lane_tflops"],
                    "per_arm_median": out["per_arm_median"],
                }) + "\n")
        except OSError:
            pass

    print(json.dumps(out))


if __name__ == "__main__":
    main()
