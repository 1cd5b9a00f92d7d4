"""Per-shape int8-vs-bf16 conv probe at YOLOv5m's ACTUAL conv shapes.

Round-3 question: the int8 activation chain measured 0.979x of bf16
end-to-end despite probe_int8.py reading 1.42x on one deep-layer conv
(80x80x192). Hypothesis: the early high-spatial/low-channel layers are
memory/VPU-bound, so int8 gains nothing there and the epilogue quantize
costs extra — only the deep layers (channels >= ~192) ride the MXU's
double-rate int8 path. If true, a depth-gated hybrid (bf16 early, int8
chain deep) could net > 1.0x.

Each (shape, dtype) arm is its own jitted chained loop; arms are
INTERLEAVED per round (relay lane rule, CLAUDE.md) and each arm's chain
threads its output back to its input (requantized), so no call repeats.
"""

import statistics
import time

import jax
import jax.numpy as jnp
from jax import lax

# (spatial, cin, cout, kernel, stride) — YOLOv5m first_out=48 @640, both
# backbone and neck representatives. bs fixed at 16 (keeps VMEM happy at
# 320^2 while deep shapes stay MXU-saturated).
SHAPES = [
    (320, 48, 96, 3, 2),     # backbone stage-2 downsample
    (160, 96, 96, 3, 1),     # C3 bottleneck body @160
    (160, 96, 192, 3, 2),    # stage-3 downsample
    (80, 192, 192, 3, 1),    # C3 body @80 (probe_int8's winner)
    (80, 192, 384, 3, 2),    # stage-4 downsample
    (40, 384, 384, 3, 1),    # C3 body @40
    (40, 384, 768, 3, 2),    # stage-5 downsample
    (20, 768, 768, 3, 1),    # C3 body @20
    (80, 384, 192, 1, 1),    # neck 1x1 (concat reduce)
    (40, 768, 384, 1, 1),    # neck 1x1
]
BS = 16


def make_arm_bf16(s, cin, cout, k, stride, key):
    w = jax.jit(lambda kk: jax.random.normal(
        kk, (k, k, cin, cout), jnp.bfloat16))(key)
    jax.block_until_ready(w)
    dn = lax.conv_dimension_numbers((BS, s, s, cin), w.shape,
                                    ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def arm(x, n_iters_dummy):
        def body(x, _):
            y = lax.conv_general_dilated(
                x, w, (stride, stride), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.float32)
            y = jax.nn.silu(y).astype(jnp.bfloat16)
            # fold spatially back to input size so the chain closes
            if stride == 2:
                y = jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)
            if cout != cin:
                y = y[..., :cin] if cout > cin else jnp.tile(
                    y, (1, 1, 1, -(-cin // cout)))[..., :cin]
            return (y / jnp.bfloat16(4.0)), ()
        x, _ = lax.scan(body, x, None, length=4)
        return x
    x0 = jax.jit(lambda kk: jax.random.normal(
        kk, (BS, s, s, cin), jnp.bfloat16))(key)
    return arm, x0


def make_arm_int8(s, cin, cout, k, stride, key):
    w = jax.jit(lambda kk: jax.random.randint(
        kk, (k, k, cin, cout), -127, 127, jnp.int8))(key)
    jax.block_until_ready(w)
    dn = lax.conv_dimension_numbers((BS, s, s, cin), w.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    inv_scale = 1.0 / (k * k * cin * 42.0)

    @jax.jit
    def arm(x, n_iters_dummy):
        def body(x, _):
            y = lax.conv_general_dilated(
                x, w, (stride, stride), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            # chain epilogue: dequant-scale + silu + requant (the real
            # chain's per-CBL elementwise cost)
            yf = jax.nn.silu(y.astype(jnp.float32) * inv_scale)
            yq = jnp.clip(jnp.round(yf * 32.0), -127, 127).astype(jnp.int8)
            if stride == 2:
                yq = jnp.repeat(jnp.repeat(yq, 2, axis=1), 2, axis=2)
            if cout != cin:
                yq = yq[..., :cin] if cout > cin else jnp.tile(
                    yq, (1, 1, 1, -(-cin // cout)))[..., :cin]
            return yq, ()
        x, _ = lax.scan(body, x, None, length=4)
        return x
    x0 = jax.jit(lambda kk: jax.random.randint(
        kk, (BS, s, s, cin), -127, 127, jnp.int8))(key)
    return arm, x0


def main(rounds=10):
    arms = {}
    for i, spec in enumerate(SHAPES):
        key = jax.random.PRNGKey(i)
        name = "s%d_c%d>%d_k%d%s" % (spec[0], spec[1], spec[2], spec[3],
                                     "_s2" if spec[4] == 2 else "")
        for dt, mk in (("bf16", make_arm_bf16), ("int8", make_arm_int8)):
            arm, x0 = mk(*spec, key)
            x = arm(x0, 0)          # compile + warm
            jax.block_until_ready(x)
            arms[(name, dt)] = [arm, x]

    results = {k: [] for k in arms}
    for r in range(rounds):
        for k, st in arms.items():
            arm, x = st
            t0 = time.perf_counter()
            x = arm(x, 0)
            _ = float(jnp.sum(jnp.abs(x[0, 0, :4].astype(jnp.float32))))
            dt = time.perf_counter() - t0
            st[1] = x
            results[k].append(dt / 4)   # per-conv-iter seconds

    print("%-22s %10s %10s %8s" % ("shape", "bf16 us", "int8 us", "ratio"))
    for spec in SHAPES:
        name = "s%d_c%d>%d_k%d%s" % (spec[0], spec[1], spec[2], spec[3],
                                     "_s2" if spec[4] == 2 else "")
        tb = statistics.median(results[(name, "bf16")]) * 1e6
        ti = statistics.median(results[(name, "int8")]) * 1e6
        print("%-22s %10.1f %10.1f %8.2f" % (name, tb, ti, tb / ti))


if __name__ == "__main__":
    main()
