"""Op-level diagnosis of the 310 GB/s `multiply_add_fusion` category
(VERDICT r3 #4): is 25% of the forward really running at 38% of HBM peak,
or is the category's apparent bandwidth an artifact of conv COMPUTE time
being folded into the same events?

Method: join the trace with the compiled HLO.
  1. AOT-compile the serving forward and parse `compiled.as_text()` —
     every fusion instruction is mapped to its fused computation body
     (op-kind histogram) and, for conv-bearing fusions, to exact conv
     FLOPs (2 * out_elems * kh*kw*cin from the parameter shapes).
  2. Trace 4 chained bs=128 forwards (same shape as profile_trace_fwd,
     decoy program interleaved per the relay lane rule).
  3. For each XLA-Ops event: bytes_accessed/dur = achieved GB/s, and
     flops/dur = achieved FLOP/s. Classify against BOTH rooflines
     (819 GB/s HBM, 197 bf16 TFLOP/s on v5e): an event is "fine" if it
     runs near EITHER limit; a real problem only if far from both.

Output: per-category rollup split conv-bearing vs pure-elementwise, the
top individual events with their fused op kinds, and the roofline
efficiency  max(t_bytes, t_flops)/dur  per category. HLO text is saved to
/tmp/fwd_hlo.txt for manual follow-up.

  PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/profile_fusion_diag.py
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
HBM_GBS = 819e9          # v5e HBM peak bytes/s
MXU_FLOPS = 197e12       # v5e bf16 peak FLOP/s


def build():
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

    @jax.jit
    def decoy(x, acc):
        return acc + (x[:1, ::97, ::97].astype(jnp.float32).sum() * 0) + 1.0

    return fwd, decoy


_SHAPE_RE = re.compile(r"(?:bf16|f32|f16|s32|u32|s8|u8|pred|s16|u16)"
                       r"\[([\d,]*)\]")
_DEF_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.-]+)\s*=\s*"
                     r"((?:\([^)]*\))|[^\s]+)\s+([\w-]+)\(")
_FUSION_RE = re.compile(r"fusion\(.*?kind=(\w+), calls=%?([\w.-]+)")


def parse_hlo(text):
    """Return {fusion_instr_name: {kinds: Counter, conv_flops: float,
    out_elems: int}} plus computation bodies."""
    # 1. split into computations: "%name (params) -> type {" ... "}"
    comp_ops = {}          # comp name -> list of (instr_name, type_str, opcode, line)
    cur = None
    for line in text.splitlines():
        m = re.match(r"^(?:ENTRY\s+)?%?([\w.-]+)\s+\([^)]*\)\s*->.*{\s*$",
                     line)
        if m:
            cur = m.group(1)
            comp_ops[cur] = []
            continue
        if line.strip() == "}":
            cur = None
            continue
        if cur is None:
            continue
        d = _DEF_RE.match(line)
        if d:
            comp_ops[cur].append((d.group(1), d.group(2), d.group(3), line))

    def shape_elems(type_str):
        m = _SHAPE_RE.search(type_str)
        if not m or not m.group(1):
            return 1
        n = 1
        for d in m.group(1).split(","):
            n *= int(d)
        return n

    # 2. per-computation name->type map (for conv kernel shapes) and
    #    per-INSTRUCTION flops (standalone convs in ENTRY need their own)
    info = {}
    instr_flops = {}
    for comp, ops in comp_ops.items():
        name2type = {n: t for (n, t, _, _) in ops}
        kinds = collections.Counter(op for (_, _, op, _) in ops
                                    if op not in ("parameter", "constant"))
        conv_flops = 0.0
        for (n, t, op, line) in ops:
            if op not in ("convolution", "dot"):
                continue
            out = shape_elems(t)
            operands = re.findall(r"%?([\w.-]+)(?:,|\))",
                                  line.split(op + "(", 1)[1])
            f = 0.0
            if op == "convolution" and len(operands) >= 2:
                ker_t = name2type.get(operands[1], "")
                km = _SHAPE_RE.search(ker_t)
                if km and km.group(1):
                    kd = [int(x) for x in km.group(1).split(",")]
                    # dim_labels 01io -> [kh, kw, cin, cout]
                    if len(kd) == 4:
                        f = 2.0 * out * kd[0] * kd[1] * kd[2]
            elif op == "dot" and len(operands) >= 2:
                rhs_t = name2type.get(operands[1], "")
                f = 2.0 * out * max(shape_elems(rhs_t) // max(
                    shape_elems(t) // out, 1), 1)
            conv_flops += f
            instr_flops[n] = f
        info[comp] = {"kinds": kinds, "conv_flops": conv_flops}

    # 3. fusion instructions anywhere -> their called computation's info
    fusions = {}
    for comp, ops in comp_ops.items():
        for (n, t, op, line) in ops:
            if op != "fusion":
                continue
            fm = _FUSION_RE.search(line)
            called = fm.group(2) if fm else None
            ci = info.get(called, {"kinds": collections.Counter(),
                                   "conv_flops": 0.0})
            fusions[n] = {"kinds": ci["kinds"],
                          "conv_flops": ci["conv_flops"],
                          "out_elems": shape_elems(t)}
        # non-fusion instructions in ENTRY can also show up as events
        for (n, t, op, line) in ops:
            if op in ("fusion", "parameter", "constant", "tuple",
                      "get-tuple-element"):
                continue
            if n not in fusions:
                fusions[n] = {"kinds": collections.Counter([op]),
                              "conv_flops": instr_flops.get(n, 0.0),
                              "out_elems": shape_elems(t)}
    return fusions


def capture(fwd, decoy, bs=128):
    trace_dir = tempfile.mkdtemp(prefix="jaxtrace_")
    gen = jax.jit(lambda k: jax.random.uniform(k, (bs, 640, 640, 3),
                                               jnp.float32))
    xs = [jax.block_until_ready(gen(jax.random.PRNGKey(i))) for i in range(2)]
    acc = fwd(xs[0], jnp.float32(0))
    acc = decoy(xs[0], acc)
    float(acc)
    jax.profiler.start_trace(trace_dir)
    for i in range(N_FWD):
        acc = fwd(xs[i % 2], acc)
        acc = decoy(xs[i % 2], acc)
    assert float(acc) >= 0
    jax.profiler.stop_trace()
    return trace_dir


def load_events(trace_dir):
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
    out = []
    for e in events:
        if e.get("ph") != "X" or "TPU" not in pnames.get(e["pid"], ""):
            continue
        if tnames.get((e["pid"], e["tid"])) != "XLA Ops":
            continue
        name = e["name"].split("/")[-1].lstrip("%")
        out.append((name, e["dur"],
                    int(e.get("args", {}).get("bytes_accessed", 0))))
    return out


def main():
    fwd, decoy = build()
    bs = 128
    x0 = jnp.zeros((bs, 640, 640, 3), jnp.float32)
    print("compiling + dumping HLO ...")
    compiled = jax.jit(fwd).lower(x0, jnp.float32(0)).compile()
    hlo_text = compiled.as_text()
    with open("/tmp/fwd_hlo.txt", "w") as f:
        f.write(hlo_text)
    fusions = parse_hlo(hlo_text)
    print(f"parsed {len(fusions)} HLO instructions "
          f"({sum(1 for v in fusions.values() if v['conv_flops'] > 0)} "
          f"conv/dot-bearing); HLO saved to /tmp/fwd_hlo.txt")

    print("tracing ...")
    events = load_events(capture(fwd, decoy, bs=bs))

    # per-event join
    rows = []
    unmatched_us = 0.0
    for name, dur, nbytes in events:
        base = re.sub(r"[.\d]+$", "", name) or name
        fi = fusions.get(name)
        if fi is None:
            unmatched_us += dur
            fi = {"kinds": collections.Counter(), "conv_flops": 0.0}
        t_bytes = nbytes / HBM_GBS * 1e6          # us at HBM peak
        t_flops = fi["conv_flops"] / MXU_FLOPS * 1e6
        rows.append({
            "name": name, "base": base, "dur": dur, "bytes": nbytes,
            "flops": fi["conv_flops"], "kinds": fi["kinds"],
            "conv": fi["conv_flops"] > 0,
            "t_bytes": t_bytes, "t_flops": t_flops,
            "eff": max(t_bytes, t_flops) / max(dur, 1e-9),
            "bound": "mxu" if t_flops > t_bytes else "hbm",
        })
    total_us = sum(r["dur"] for r in rows)
    print(f"device op time {total_us / N_FWD / 1e3:.2f} ms/fwd; "
          f"unmatched-to-HLO {unmatched_us / N_FWD / 1e3:.2f} ms/fwd")

    # rollup: category x conv-bearing
    agg = collections.defaultdict(lambda: [0.0, 0, 0.0, 0.0, 0.0])
    for r in rows:
        key = (r["base"], r["conv"])
        a = agg[key]
        a[0] += r["dur"]; a[1] += 1; a[2] += r["bytes"]
        a[3] += r["flops"]; a[4] += max(r["t_bytes"], r["t_flops"])
    print(f"\n{'category':30s} {'conv':>4s} {'ms/fwd':>7s} {'ops':>4s} "
          f"{'GB/s':>5s} {'TFLOP/s':>8s} {'roofline%':>9s} {'bound':>5s}")
    for (base, conv), a in sorted(agg.items(), key=lambda kv: -kv[1][0]):
        gbs = a[2] / max(a[0], 1) / 1e3
        tfs = a[3] / max(a[0], 1) / 1e6
        eff = a[4] / max(a[0], 1) * 100
        bound = "mxu" if a[3] / MXU_FLOPS > a[2] / HBM_GBS else "hbm"
        print(f"{base[:30]:30s} {str(conv)[:4]:>4s} {a[0]/N_FWD/1e3:7.2f} "
              f"{a[1]:4d} {gbs:5.0f} {tfs:8.1f} {eff:9.0f} {bound:>5s}")

    # top individual events with op-kind signatures
    by_name = collections.defaultdict(lambda: [0.0, 0, 0.0, 0.0, None])
    for r in rows:
        a = by_name[r["name"]]
        a[0] += r["dur"]; a[1] += 1; a[2] += r["bytes"]; a[3] += r["flops"]
        a[4] = r
    print("\ntop events (aggregated over the traced forwards):")
    for name, a in sorted(by_name.items(), key=lambda kv: -kv[1][0])[:20]:
        r = a[4]
        kinds = ",".join(f"{k}x{v}" for k, v in r["kinds"].most_common(6))
        gbs = a[2] / max(a[0], 1) / 1e3
        tfs = a[3] / max(a[0], 1) / 1e6
        print(f"  {name[:36]:36s} {a[0]/N_FWD/1e3:6.2f}ms {gbs:4.0f}GB/s "
              f"{tfs:6.1f}TF/s eff={r['eff']*100:3.0f}% [{kinds[:70]}]")


if __name__ == "__main__":
    main()
