"""One-shot healthy-window measurement battery (round-2 queue).

Run when healthcheck reports >100 TFLOP/s. Executes, in order:
  1. headline bench (bench.py as a subprocess — the driver-identical capture)
  2. NMS backend A/B: fixpoint XLA vs sequential-scan XLA vs Pallas, full
     pipeline at bs=64, K=1024 and K=2048
  3. s2d stem A/B: default 6x6/s2 stem vs space-to-depth 3x3 stem (fwd-only
     and full fused pipeline)
  4. train-step decomposition (profile_train_decomp.py subprocess)

Prints a section per stage; paste results into ROUND2_NOTES.md.
"""

import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)


def section(title):
    print(f"\n===== {title} =====", flush=True)


def _chained(fn):
    """Relay-proof wrapper (same scheme as bench.py): iterations are
    dependency-chained through a device-side scalar folded into each input,
    so (a) no two executions ever see byte-identical arguments (the relay
    result-caches identical calls) and (b) one final scalar fetch forces the
    whole chain (block_until_ready has been seen returning early)."""
    @jax.jit
    def chained(x, acc):
        out = fn(x + (acc * 0).astype(x.dtype))
        leaf = jax.tree.leaves(out)[0]
        return acc + leaf.astype(jnp.float32).sum()
    return chained


def bench_fn(name, fn, xs, bs, n_rounds=3):
    chained = _chained(fn)
    acc = jnp.float32(0.0)
    for x in xs:
        acc = chained(x, acc)
    float(acc)  # warmup + full sync
    t0 = time.perf_counter()
    for _ in range(n_rounds):
        for x in xs:
            acc = chained(x, acc)
    float(acc)
    dt = (time.perf_counter() - t0) / (n_rounds * len(xs))
    print(f"{name:44s} {dt*1000:7.2f} ms/batch  {bs/dt:7.1f} img/s", flush=True)
    return dt


def bench_arms(arms, xs, bs, n_rounds=4):
    """A/B with INTERLEAVED arms: each round times every arm once over xs, so
    a chip flap mid-run hits all arms instead of biasing one. Reports each
    arm's BEST round (chip capability) and the full segment list.
    arms: {name: fn}. Returns {name: best ms/batch}."""
    chained = {}
    accs = {}   # per-arm accumulator threaded across ALL rounds: resetting
    # would make round r+1 a byte-identical replay of round r (same xs, same
    # acc trajectory) that a result-caching relay could serve unexecuted
    for name, fn in list(arms.items()):
        try:
            c = _chained(fn)
            a = c(xs[0], jnp.float32(0.0))
            float(a)                       # compile + warm
            chained[name] = c
            accs[name] = a
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    segs = {name: [] for name in chained}
    for _ in range(n_rounds):
        for name, c in chained.items():
            acc = accs[name]
            t0 = time.perf_counter()
            for x in xs:
                acc = c(x, acc)
            float(acc)
            accs[name] = acc
            segs[name].append((time.perf_counter() - t0) / len(xs))
    best = {}
    for name, ss in segs.items():
        dt = min(ss)
        best[name] = dt
        all_ms = "/".join(f"{s*1000:.1f}" for s in ss)
        print(f"{name:44s} best {dt*1000:7.2f} ms/batch  {bs/dt:7.1f} img/s"
              f"  (rounds: {all_ms})", flush=True)
    return best


def main():
    from yolov5m_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()

    section("healthcheck")
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "healthcheck", os.path.join(_HERE, "healthcheck.py"))
    hc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(hc)
    health = hc.main()
    if not health["healthy"] and "--force" not in sys.argv:
        print("chip degraded — aborting (use --force to run anyway)")
        return

    env = dict(os.environ,
               PYTHONPATH=_REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))

    section("1. headline bench (bench.py)")
    subprocess.run([sys.executable, os.path.join(_REPO, "bench.py")],
                   check=False, env=env)

    from yolov5m_tpu.models import YOLOv5
    from yolov5m_tpu.models.fuse import fold_batchnorm
    from yolov5m_tpu.models.s2d import stem_weights_to_s2d
    from yolov5m_tpu.models.yolo import normalized_anchors
    from yolov5m_tpu.ops.postprocess import fused_detect

    bs = 64
    model = YOLOv5(first_out=48, nc=80, dtype=jnp.bfloat16, fused=True)
    base = YOLOv5(first_out=48, nc=80, dtype=jnp.bfloat16)
    fvars = fold_batchnorm(
        base.init(jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3))))
    anchors = jnp.asarray(normalized_anchors())
    gen = jax.jit(lambda k: jax.random.uniform(k, (bs, 640, 640, 3), jnp.float32))
    xs = [gen(jax.random.PRNGKey(i)) for i in range(8)]
    jax.block_until_ready(xs)

    section("2. NMS backend A/B (full fused pipeline, interleaved arms)")
    arms = {}
    for k in (1024, 2048):
        for backend in ("xla", "xla_loop", "pallas"):
            arms[f"pipeline K={k} nms={backend}"] = (
                lambda x, b=backend, kk=k: fused_detect(
                    model.apply(fvars, x, train=False), anchors,
                    conf_threshold=0.25, iou_threshold=0.6,
                    pre_nms_topk=kk, backend=b))
    bench_arms(arms, xs, bs)

    section("3. s2d stem A/B (interleaved arms)")
    s2d_model = YOLOv5(first_out=48, nc=80, dtype=jnp.bfloat16, fused=True,
                       stem_s2d=True)
    s2d_vars = stem_weights_to_s2d(fvars)
    bench_arms({
        "fwd only, default stem":
            lambda x: model.apply(fvars, x, train=False)[0],
        "fwd only, s2d stem":
            lambda x: s2d_model.apply(s2d_vars, x, train=False)[0],
        "pipeline, default stem":
            lambda x: fused_detect(model.apply(fvars, x, train=False),
                                   anchors, conf_threshold=0.25,
                                   iou_threshold=0.6),
        "pipeline, s2d stem":
            lambda x: fused_detect(s2d_model.apply(s2d_vars, x, train=False),
                                   anchors, conf_threshold=0.25,
                                   iou_threshold=0.6),
    }, xs, bs)

    section("4. train-step decomposition")
    subprocess.run([sys.executable,
                    os.path.join(_HERE, "profile_train_decomp.py")],
                   check=False, env=env)

    section("5. train throughput (profile_train.py)")
    subprocess.run([sys.executable, os.path.join(_HERE, "profile_train.py")],
                   check=False, env=env)


if __name__ == "__main__":
    main()
