"""Device-op profile of the serving forward via jax.profiler (works on the
axon relay — the trace carries real /device:TPU:0 "XLA Ops" lanes).

Captures 4 chained bs=128 forwards, then aggregates per-op device time and
bytes_accessed from the trace.json.gz. The 2026-08-18 capture answers the
round-2 "where does the MFU gap go" question:

  * total device time 56.3 ms/fwd (wall 60.9 in the same window — the rest
    is gaps/dispatch);
  * NO MXU-bound op dominates: the top categories are conv+SiLU fusions
    ("divide_multiply_fusion" 20.8 ms/fwd over 108 ops — sigmoid's divide
    names the fusion; "multiply_add_fusion" 17.6 ms over 56; generic
    "fusion" 12.3 ms over 64);
  * the single largest ops access 0.9-1.9 GB each and sustain 557-600 GB/s
    = 68-73% of the 819 GB/s HBM peak → the forward is BANDWIDTH-bound on
    the high-spatial early layers, not MXU-bound.

Consequences (ties the measured negatives together): int8 MXU doubling
can't help a bandwidth-bound graph (measured 0.97-0.98x), s2d trades
bandwidth for FLOPs the wrong way here (measured 0.95x), and XLA scheduling
knobs move <1.5% (measured). The remaining forward headroom is byte
reduction on early activations — a VMEM-resident multi-layer stem pipeline
(Pallas megakernel) is the lever, est. <=10-15% of forward, high effort.

  PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/profile_trace_fwd.py
"""

import collections
import glob
import gzip
import json
import os
import re
import tempfile

import jax
import jax.numpy as jnp

from yolov5m_tpu.config import Config
from yolov5m_tpu.models import YOLOv5
from yolov5m_tpu.models.fuse import fold_batchnorm

N_FWD = 4


def capture(bs=128, trace_dir=None):
    trace_dir = trace_dir or tempfile.mkdtemp(prefix="jaxtrace_")
    cfg = Config()
    variables = fold_batchnorm(
        YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3))))
    model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16,
                   fused=True)

    @jax.jit
    def fwd(x, acc):
        preds = model.apply(variables, x + (acc * 0).astype(x.dtype),
                            train=False)
        return acc + sum(p.astype(jnp.float32).sum() * 0 for p in preds) + 1.0

    # second DISTINCT jitted program interleaved per round: a single-program
    # loop gets throttled to ~2-4% of chip speed by the relay (CLAUDE.md
    # lane rule) and would distort the traced gaps/wall time
    @jax.jit
    def decoy(x, acc):
        return acc + (x[:1, ::97, ::97].astype(jnp.float32).sum() * 0) + 1.0

    gen = jax.jit(lambda k: jax.random.uniform(k, (bs, 640, 640, 3),
                                               jnp.float32))
    xs = [jax.block_until_ready(gen(jax.random.PRNGKey(i))) for i in range(2)]
    acc = fwd(xs[0], jnp.float32(0))
    acc = decoy(xs[0], acc)
    float(acc)  # compile + warm outside the trace
    jax.profiler.start_trace(trace_dir)
    for i in range(N_FWD):
        acc = fwd(xs[i % 2], acc)
        acc = decoy(xs[i % 2], acc)
    assert float(acc) >= 0
    jax.profiler.stop_trace()
    return trace_dir


def analyze(trace_dir):
    paths = glob.glob(os.path.join(trace_dir, "plugins", "profile", "*",
                                   "*.trace.json.gz"))
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(sorted(paths)[-1]) as f:
        t = json.load(f)
    events = t["traceEvents"]
    tnames, pnames = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e["tid"])] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"]["name"]

    cat_us, cat_n, cat_bytes = (collections.Counter(), collections.Counter(),
                                collections.Counter())
    total_us = 0.0
    for e in events:
        if e.get("ph") != "X" or "TPU" not in pnames.get(e["pid"], ""):
            continue
        if tnames.get((e["pid"], e["tid"])) != "XLA Ops":
            continue
        base = re.sub(r"[.\d]+$", "", e["name"].split("/")[-1]) or e["name"]
        cat_us[base] += e["dur"]
        cat_n[base] += 1
        cat_bytes[base] += int(e.get("args", {}).get("bytes_accessed", 0))
        total_us += e["dur"]

    print(f"device op time: {total_us / N_FWD / 1e3:.2f} ms/fwd "
          f"({N_FWD} forwards traced)")
    print(f"{'category':32s} {'ms/fwd':>8s} {'ops':>5s} {'GB/fwd':>8s} "
          f"{'GB/s':>7s}")
    for name, us in cat_us.most_common(14):
        gb = cat_bytes[name] / N_FWD / 1e9
        bw = cat_bytes[name] / max(cat_us[name], 1) / 1e3  # bytes/us = GB/s
        print(f"{name[:32]:32s} {us / N_FWD / 1e3:8.2f} {cat_n[name]:5d} "
              f"{gb:8.2f} {bw:7.0f}")


if __name__ == "__main__":
    d = capture()
    print(f"trace: {d}")
    analyze(d)
