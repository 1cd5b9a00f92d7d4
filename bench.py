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
  * LOAD REALISM (round 4): when weights/flagship_synth_bf16.msgpack
    exists (trained on structured synthetic data by benchmarks/
    train_flagship_synth.py), the HEADLINE cell runs those weights on
    structured inputs from the same distribution, so the gate/top-k/NMS
    stages see a realistic detection density — reported as
    `detection_density` (gate survivors and final detections per image)
    for both loads, with the random-init/noise cell kept as an A/B
    (`noise_load_median`, `trained_vs_noise`). Weights enter the jit as
    ARGUMENTS, so both loads execute the identical compiled program;
  * INGRESS REALISM (round 4): the headline cell takes UINT8 inputs and
    normalizes on device (x/255 -> bf16) — the production serving
    ingress (serving/server.py ships uint8 over TCP/PCIe; real camera/
    decode output is uint8). This is also faster than f32 ingress
    (+1.9%: half the HBM read traffic on the 629 MB input convert —
    benchmarks/profile_ingress.py). An f32-ingress cell of the same
    structured load is kept as the A/B (`ingress_u8_vs_f32`);
    `trained_vs_noise` compares the f32 cells so it isolates LOAD only;
  * the HEADLINE value is the MEDIAN round of the cell whose backend is the
    shipped auto-selected default (ops/nms.py resolve_backend) on the
    trained load (noise load if no weights file) over a fixed time budget,
    after a fixed 2-round untimed warmup. Max and per-arm medians are
    reported as auxiliary fields only;
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
from yolov5m_tpu.data.synthetic import synth_batch
from yolov5m_tpu.models import YOLOv5
from yolov5m_tpu.models.fuse import fold_batchnorm_device
from yolov5m_tpu.models.yolo import normalized_anchors
from yolov5m_tpu.ops.nms import resolve_backend
from yolov5m_tpu.ops.postprocess import fused_detect, gate_density
from yolov5m_tpu.ops.preprocess import normalize_uint8

# 2x ~300 img/s (plain-torch A100 yolov5m batch inference). Provenance and
# a hostile-reviewer sensitivity analysis: BASELINE.md "Provenance of the
# vs_baseline denominator".
A100_TARGET_IMG_S = 600.0
_HERE = os.path.dirname(os.path.abspath(__file__))
_T0 = time.time()


def _log(msg: str) -> None:
    """Phase progress on STDERR (stdout stays exactly one JSON line).

    Setup over the relay can cost minutes (4 big pipeline compiles + input
    generation); without a heartbeat a driver-side timeout is
    indistinguishable from a hang. Every log line also becomes the
    current `phase` in the partial-JSON safety net below."""
    import sys
    _PROGRESS["phase"] = msg
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


# ---------------------------------------------------------------------------
# Partial-capture safety net (round-4 postmortem: BENCH_r04.json was
# `parsed: null` because the driver's timeout killed the process before the
# single JSON line was printed). Two independent guards ensure SOME JSON
# always reaches stdout:
#   * a watchdog thread emits at BENCH_WALL_SECONDS (default 1680s, under
#     the driver's observed ~30-min cap) — threads keep running while the
#     main thread is blocked inside a C++ device wait, which is exactly
#     when a SIGTERM python handler would be delayed;
#   * a SIGTERM handler emits if the driver kills us first.
# Both print the median of whatever headline rounds exist (value=null if
# none), tag status="partial", and append a forensic ledger entry — so an
# aborted run is still a (degraded) record instead of nothing.
# ---------------------------------------------------------------------------
import threading as _threading

_PROGRESS = {"phase": "import", "headline": None, "per_arm": None,
             "done": False, "budget_s": None, "wall_budget_s": None}
# RLock: a SIGTERM handler runs IN the main thread — with a plain Lock a
# signal landing while the main thread holds the final-emission guard
# would deadlock the handler on its own thread's lock.
_EMIT_LOCK = _threading.RLock()


def _ledger_append(entry: dict) -> None:
    """Append-only forensic record of every run on real hardware —
    including aborted ones (round-4 review Missing #3)."""
    try:
        if jax.devices()[0].platform == "cpu":
            return
        with open(os.path.join(_HERE, "BENCH_OBSERVATIONS.jsonl"), "a") as f:
            f.write(json.dumps(entry) + "\n")
    except Exception:
        pass


def _emit_partial(reason: str) -> None:
    import statistics as _st
    with _EMIT_LOCK:
        if _PROGRESS["done"]:
            return
        _PROGRESS["done"] = True
    per_arm = _PROGRESS.get("per_arm") or {}
    hl = _PROGRESS.get("headline")
    rounds = list(per_arm.get(hl) or ())
    value = round(_st.median(rounds), 2) if rounds else None
    out = {
        "metric": "640x640 images/sec/chip incl. NMS "
                  "(PARTIAL capture: %s)" % reason,
        "value": value,
        "unit": "images/sec/chip",
        "vs_baseline": (round(value / A100_TARGET_IMG_S, 3)
                        if value else None),
        "status": "partial",
        "partial_reason": reason,
        "phase_reached": _PROGRESS["phase"],
        "elapsed_s": round(time.time() - _T0, 1),
        "rounds_measured": len(rounds),
        "per_arm_median": {k: round(_st.median(v), 2)
                           for k, v in per_arm.items() if v},
        "note": "run cut short before the full protocol completed; value "
                "is the median of headline rounds measured so far (null if "
                "none). Protocol + healthy-chip record: "
                "BENCH_OBSERVATIONS.jsonl.",
    }
    _ledger_append({
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "status": "partial:" + reason,
        "value": value,
        "vs_baseline": out["vs_baseline"],
        "rounds": len(rounds),
        "budget_s": _PROGRESS.get("budget_s"),
        # which limit actually fired: reason names it, this records its size
        "wall_budget_s": _PROGRESS.get("wall_budget_s"),
        "phase_reached": _PROGRESS["phase"],
        "elapsed_s": out["elapsed_s"],
        "per_arm_median": out["per_arm_median"],
    })
    print(json.dumps(out), flush=True)


def _arm_safety_net() -> None:
    import signal
    budget = float(os.environ.get("BENCH_WALL_SECONDS", "1680"))
    _PROGRESS["wall_budget_s"] = int(budget)

    def watchdog():
        while not _PROGRESS["done"]:
            left = _T0 + budget - time.time()
            if left <= 0:
                phase = _PROGRESS["phase"]   # keep the REAL last phase
                _log(f"WALL BUDGET {budget:.0f}s reached: emitting partial "
                     "JSON and exiting")
                _PROGRESS["phase"] = phase
                _emit_partial("wall_budget")
                os._exit(0)
            time.sleep(min(left, 5.0))

    _threading.Thread(target=watchdog, daemon=True).start()

    def on_sigterm(signum, frame):
        # Runs IN the main thread, possibly interrupting an in-progress
        # print: no print()/logging here (a reentrant call into the same
        # BufferedWriter raises and would kill the handler before the JSON
        # goes out — the exact failure this net exists to prevent).
        # os.write to stderr is signal-safe; _EMIT_LOCK is an RLock so an
        # interrupt inside the final-emission guard cannot self-deadlock.
        os.write(2, b"[bench] SIGTERM: emitting partial JSON and exiting\n")
        _emit_partial("sigterm")
        os._exit(0)

    try:
        signal.signal(signal.SIGTERM, on_sigterm)
    except ValueError:
        pass  # not the main thread (imported use) — watchdog still covers


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
    # skip the multi-minute remote compile of the full pipeline. No explicit
    # dir: enable_compile_cache defaults to the repo .jax_cache but honors a
    # JAX_COMPILATION_CACHE_DIR override (so cold-compile measurements can
    # point this entry point at an empty dir).
    from yolov5m_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()
    _arm_safety_net()

    cfg = Config()
    _log(f"start: platform={jax.devices()[0].platform}")
    base = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)

    # Init + BN-fold as ONE jitted program (round-4 postmortem: eager
    # flax init is hundreds of per-op relay dispatches and host-numpy
    # fold_batchnorm fetches every leaf — in a degraded ~25ms/dispatch
    # window that setup ate 1734s of the official 30-min budget,
    # BENCH_r04.json rc=124). One dispatch + one cached compile instead.
    @jax.jit
    def _init_fold(rng):
        v = base.init(rng, jnp.zeros((1, 640, 640, 3), jnp.float32))
        return fold_batchnorm_device(v)

    variables = _init_fold(rng)
    jax.block_until_ready(variables)
    _log("model init + BN fold done (one jitted program)")
    model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16,
                   fused=True)
    anchors = jnp.asarray(normalized_anchors())

    # Realistic detection load (VERDICT r3 Missing #2): flagship weights
    # trained on structured synthetic images (benchmarks/
    # train_flagship_synth.py; provenance sidecar next to the file). When
    # present, the HEADLINE arm runs those weights on structured inputs
    # drawn from the training distribution, and the random-init/noise arm
    # is kept as the A/B continuity record. Variables are passed as jit
    # ARGUMENTS, so both loads share the identical compiled program —
    # the A/B differs only in data.
    from yolov5m_tpu.models.weights import load_flagship
    trained_vars, weights_meta = load_flagship(fold=True, missing_ok=True)

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
        def arm(v, xs, acc):
            # acc folds into each input so iteration i+1 depends on i and
            # call j+1 depends on call j: one final scalar fetch proves the
            # whole chain executed. Weights `v` are an argument so every
            # load profile of the same input dtype shares this one
            # compiled program (jit retraces once per ingress dtype).
            def body(acc, x):
                if x.dtype == jnp.uint8:
                    # production serving ingress: the same shared helper +
                    # compute dtype serving/server.py uses behind the socket
                    x = normalize_uint8(x, jnp.bfloat16)
                preds = model.apply(v, x + (acc * 0).astype(x.dtype),
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
    arm_fns = {b: make_arm(b) for b in backends}
    _log(f"arms built: {backends}; generating noise inputs")

    # distinct device-resident batches, generated on device, stacked into
    # CHAIN_LEN-deep scan inputs
    gen = jax.jit(lambda k: jax.random.uniform(
        k, (CHAIN_LEN, batch_size, 640, 640, 3), jnp.float32))
    xs_noise = [gen(jax.random.PRNGKey(i)) for i in range(2)]
    jax.block_until_ready(xs_noise)
    _log("noise inputs resident")

    # Measurement cells: (name, backend, variables, inputs). With trained
    # weights present the headline is the default backend on the TRAINED
    # load; the random/noise cell stays for the A/B and r1-r3 continuity.
    # Without them (fresh clone), behavior degrades to the r3 protocol.
    v_dev = jax.device_put(variables)
    cells = {}
    if trained_vars is not None:
        gen_s = jax.jit(lambda k: jax.vmap(
            lambda kk: synth_batch(kk, batch_size, 640, cfg.nc)[0])(
                jax.random.split(k, CHAIN_LEN)))
        # uint8 quantization of the SAME resident scenes (identity by
        # construction, and no second synth_batch compile/run): what a
        # camera/decoder actually delivers (quantization error <= 1/510
        # per pixel; the detection_density fields record its (nil) effect)
        to_u8 = jax.jit(lambda x: jnp.round(x * 255).astype(jnp.uint8))
        xs_struct = [gen_s(jax.random.PRNGKey(100 + i)) for i in range(2)]
        xs_struct_u8 = [to_u8(x) for x in xs_struct]
        jax.block_until_ready((xs_struct, xs_struct_u8))
        _log("structured inputs (f32 + uint8) resident")
        t_dev = jax.device_put(trained_vars)
        headline = f"{default_backend}:trained"
        cells[headline] = (default_backend, t_dev, xs_struct_u8)
        cells[f"{default_backend}:trained_f32"] = (
            default_backend, t_dev, xs_struct)
        cells[f"{default_backend}:noise"] = (default_backend, v_dev, xs_noise)
        for b in backends:
            if b != default_backend:
                cells[f"{b}:trained"] = (b, t_dev, xs_struct_u8)
    else:
        headline = f"{default_backend}:noise"
        for b in backends:
            cells[f"{b}:noise"] = (b, v_dev, xs_noise)

    accs = {}
    for name, (b, v, xs) in cells.items():
        t0 = time.time()
        a = arm_fns[b](v, xs[0], jnp.float32(0.0))
        float(a)                         # compile + warm
        accs[name] = a
        _log(f"cell {name}: compiled+warm in {time.time() - t0:.1f}s")

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
    per_arm = {name: [] for name in cells}   # img/s per measured round
    # live references for the partial-capture safety net
    _PROGRESS.update(per_arm=per_arm, headline=headline,
                     budget_s=int(max_seconds))
    k = 0
    n_round = 0
    while n_round < warmup_rounds + max_rounds:
        for name, (b, v, xs) in cells.items():
            acc = accs[name]
            t0 = time.perf_counter()
            for _ in range(SEG_CALLS):
                acc = arm_fns[b](v, xs[k % len(xs)], acc)
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
            if time.time() > deadline and per_arm[headline]:
                break
        n_round += 1
        if n_round % 25 == 0 or n_round <= 3:
            _log(f"round {n_round}: headline last "
                 f"{per_arm[headline][-1]:.1f} img/s"
                 if per_arm[headline] else f"round {n_round}: warmup")
        # honor the deadline only once at least ONE measured round of the
        # headline arm exists: on a degraded window where warmup alone eats
        # the budget, an empty capture would crash the median below and
        # print no JSON at all
        if time.time() > deadline and per_arm[headline]:
            break

    # Detection-density statistics (VERDICT r3 Weak #2): how much work the
    # gate/top-k/NMS actually does per image under each load. One jitted
    # probe per load, run AFTER measurement so it cannot perturb the lane.
    # The statistic's definition is shared with the weights' provenance
    # sidecar (ops/postprocess.py gate_density) so the two cannot drift.
    @jax.jit
    def _density(v, x):
        if x.dtype == jnp.uint8:
            x = normalize_uint8(x, jnp.bfloat16)
        preds = model.apply(v, x, train=False)
        surv, ndet = gate_density(
            preds, anchors, conf_threshold=0.25,
            iou_threshold=cfg.nms_iou_thresh,
            max_detections=cfg.max_detections,
            pre_nms_topk=cfg.topk_for_conf(0.25))
        return surv.mean(), ndet.mean()

    _log(f"measurement done: {len(per_arm[headline])} rounds; "
         "density probes")
    density = {}
    for name, (b, v, xs) in cells.items():
        if name.split(":")[0] != default_backend:
            continue                       # density is backend-independent
        s, d = _density(v, xs[0][0])
        density[name.split(":")[1]] = {
            "gate_survivors_per_image": round(float(s), 1),
            "detections_per_image": round(float(d), 1),
            "pre_nms_topk": cfg.topk_for_conf(0.25)}

    # lane-forensics probe AFTER measurement (subprocess; a hung probe must
    # not eat the measurement budget)
    if os.environ.get("BENCH_SKIP_PROBE"):
        probe = {}
    else:
        _log("lane-forensics matmul probe (subprocess, <=240s)")
        probe = run_matmul_probe()

    headline_rounds = per_arm[headline]
    img_s = statistics.median(headline_rounds)
    fast_seen = any(r >= A100_TARGET_IMG_S for rs in per_arm.values()
                    for r in rs)
    load_desc = ("trained weights (benchmarks/train_flagship_synth.py) on "
                 "structured synthetic images, uint8 ingress + on-device "
                 "normalize (production serving ingress)"
                 if trained_vars is not None else
                 "random-init weights on uniform noise (no weights file)")
    noise_key = f"{default_backend}:noise"
    noise_median = (round(statistics.median(per_arm[noise_key]), 2)
                    if per_arm.get(noise_key) else None)
    f32_key = f"{default_backend}:trained_f32"
    trained_f32_median = (round(statistics.median(per_arm[f32_key]), 2)
                          if per_arm.get(f32_key) else None)
    out = {
        "metric": "640x640 images/sec/chip incl. NMS (bs=%d, bf16, fused "
                  "postprocess, %s NMS backend, %s)" % (
                      batch_size, default_backend,
                      "trained-structured load, uint8 ingress"
                      if trained_vars is not None else "noise load"),
        "value": round(img_s, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_s / A100_TARGET_IMG_S, 3),
        "status": "ok",
        "load": load_desc,
        "protocol": "median round of the headline cell (default backend, "
                    "%s) over a fixed %ds budget, %d-round untimed warmup, "
                    "no value-conditioned stopping; one round = %d async-"
                    "enqueued lax.scan calls per cell, each scanning %d "
                    "distinct chained bs=%d batches on device, one scalar "
                    "fetch per segment; headline ingress is uint8 + on-"
                    "device normalize (production serving mode; f32-ingress "
                    "A/B cell kept); load cells share one compiled program "
                    "per (backend, ingress dtype) — weights are jit args" % (
                        "trained load" if trained_vars is not None
                        else "noise load",
                        int(max_seconds), warmup_rounds, SEG_CALLS,
                        CHAIN_LEN, batch_size),
        "rounds_measured": len(headline_rounds),
        "max_round": round(max(headline_rounds), 2) if headline_rounds
        else None,
        "p25_round": round(statistics.quantiles(headline_rounds, n=4)[0], 2)
        if len(headline_rounds) >= 4 else None,
        "per_arm_median": {b: round(statistics.median(r), 2)
                           for b, r in per_arm.items() if r},
        "noise_load_median": noise_median,
        "trained_f32_ingress_median": trained_f32_median,
        # load A/B at SAME (f32) ingress: isolates detection-density effect
        "trained_vs_noise": (round(trained_f32_median / noise_median, 3)
                             if noise_median and trained_f32_median
                             else None),
        # ingress A/B at SAME (trained) load: isolates uint8-ingress effect
        "ingress_u8_vs_f32": (round(img_s / trained_f32_median, 3)
                              if trained_f32_median else None),
        "detection_density": density,
        "weights_provenance": ({k: weights_meta.get(k) for k in
                                ("trained", "steps", "final_loss", "data")}
                               if weights_meta else None),
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

    # Single-emission guard: if the watchdog/SIGTERM already printed a
    # partial record, do NOT print a second JSON line.
    with _EMIT_LOCK:
        if _PROGRESS["done"]:
            return
        _PROGRESS["done"] = True

    # Observation ledger: append-only forensic record of every run of this
    # script on real hardware — successes AND (via _emit_partial) aborts.
    _ledger_append({
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "status": "ok",
        "value": out["value"],
        "vs_baseline": out["vs_baseline"],
        "max_round": out["max_round"],
        "rounds": out["rounds_measured"],
        "budget_s": int(max_seconds),
        "lane": out["relay_lane_observed"],
        "single_program_lane_tflops": out["single_program_lane_tflops"],
        "per_arm_median": out["per_arm_median"],
    })

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
