"""Concat-elision A/B: conv(concat(a,b)) vs conv(a,Wa)+conv(b,Wb) in bf16.

Every concat in the model graph (C3 c_out, SPPF c_out, the neck's
cross-scale joins) feeds 1x1 convolutions, and the forward is
HBM-bandwidth-bound (profile_trace_fwd.py) — so if XLA materializes the
concatenated buffer, rewriting each consumer as a split convolution
(slicing the kernel along the input-channel dim, summing partial products
— the exact rewrite the int8 chain already uses, models/blocks.py
_quant_chain_forward) saves a write + N reads of the concat buffer.

This probes the rewrite at the model's real concat shapes WITHOUT model
surgery, per the relay-lane rules: distinct on-device inputs, iterations
chained through a lax.scan inside one jit, arms interleaved, medians
reported. Also prints the XLA cost model's bytes-accessed per arm, which
answers "does the concat materialize" independent of timing noise.

  PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/profile_splitconv.py
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# (name, H, c_half): the graph's concat sites — C3 c_out at each pyramid
# level concats two c_half tensors and feeds a 1x1 conv to 2*c_half; the
# neck joins feed TWO 1x1 consumers (C3's c1 and c_skipped).
SITES = [
    ("p2_160x48", 160, 48),
    ("p3_80x96", 80, 96),
    ("p4_40x192", 40, 192),
]


def _conv1x1(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC")))


def _renorm(y):
    # keep magnitudes bounded across scan iterations (identical in all arms)
    return y * lax.rsqrt(jnp.mean(jnp.square(y.astype(jnp.float32)))
                         + 1e-6).astype(y.dtype)


def make_arms(h, c, t, dual):
    """Returns {name: jit((a, b, acc) -> (a, b, acc))} scanning t chained
    conv iterations. Single-consumer: one 1x1 conv 2c->2c. Dual-consumer:
    two independent 1x1 convs 2c->c each (the neck C3 c1/c_skipped shape)."""
    k0 = jax.random.PRNGKey(7)
    scale = 1.0 / np.sqrt(2 * c)
    w = (jax.random.normal(k0, (1, 1, 2 * c, 2 * c)) * scale).astype(jnp.bfloat16)
    v = (jax.random.normal(jax.random.fold_in(k0, 1), (1, 1, 2 * c, c))
         * scale).astype(jnp.bfloat16)
    v2 = (jax.random.normal(jax.random.fold_in(k0, 2), (1, 1, 2 * c, c))
          * scale).astype(jnp.bfloat16)

    def body_cat(carry, _):
        a, b, acc = carry
        if dual:
            cat = jnp.concatenate([a, b], -1)
            y1 = _renorm(jax.nn.silu(_conv1x1(cat, v)))
            y2 = _renorm(jax.nn.silu(_conv1x1(cat, v2)))
            a, b = y1, y2
        else:
            y = _renorm(jax.nn.silu(_conv1x1(jnp.concatenate([a, b], -1), w)))
            a, b = jnp.split(y, 2, axis=-1)
        return (a, b, acc + a.astype(jnp.float32).mean()), None

    def body_split(carry, _):
        a, b, acc = carry
        if dual:
            y1 = _renorm(jax.nn.silu(
                _conv1x1(a, v[:, :, :c]) + _conv1x1(b, v[:, :, c:])))
            y2 = _renorm(jax.nn.silu(
                _conv1x1(a, v2[:, :, :c]) + _conv1x1(b, v2[:, :, c:])))
            a, b = y1, y2
        else:
            y = _renorm(jax.nn.silu(
                _conv1x1(a, w[:, :, :c]) + _conv1x1(b, w[:, :, c:])))
            a, b = jnp.split(y, 2, axis=-1)
        return (a, b, acc + a.astype(jnp.float32).mean()), None

    def make(body):
        @jax.jit
        def arm(a, b, acc):
            (a, b, acc), _ = lax.scan(body, (a, b, acc), None, length=t)
            return a, b, acc
        return arm

    return {"cat": make(body_cat), "split": make(body_split)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--scan", type=int, default=8)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--dual", action="store_true",
                    help="two 1x1 consumers per concat (neck C3 entry shape)")
    opt = ap.parse_args()

    print(f"devices={jax.devices()} bs={opt.bs} scan={opt.scan} "
          f"dual={opt.dual}")
    for name, h, c in SITES:
        arms = make_arms(h, c, opt.scan, opt.dual)
        gen = jax.jit(lambda k, _h=h, _c=c: (
            jax.random.normal(k, (opt.bs, _h, _h, _c), jnp.bfloat16),
            jax.random.normal(jax.random.fold_in(k, 1),
                              (opt.bs, _h, _h, _c), jnp.bfloat16)))
        inputs = [jax.block_until_ready(gen(jax.random.PRNGKey(i)))
                  for i in range(3)]

        # XLA cost model: bytes accessed per compiled arm
        ex_a, ex_b = inputs[0]
        for n, arm in arms.items():
            ca = arm.lower(ex_a, ex_b, jnp.float32(0)).compile().cost_analysis()
            by = ca.get("bytes accessed", float("nan"))
            print(f"  {name} {n:>5s}: cost-model bytes/call "
                  f"{by / 1e9:6.3f} GB")

        state = {n: (inputs[0][0], inputs[0][1], jnp.float32(0))
                 for n in arms}
        for n, arm in arms.items():  # warm
            state[n] = arm(*state[n])
            float(state[n][2])

        results = {n: [] for n in arms}
        for _ in range(opt.reps):
            for n, arm in arms.items():
                a, b, acc = state[n]
                t0 = time.perf_counter()
                for i in range(opt.iters):
                    na, nb = inputs[i % len(inputs)]
                    # chain through acc so the relay can't replay-cache
                    a, b, acc = arm(na + (acc * 0).astype(na.dtype), nb, acc)
                assert np.isfinite(float(acc))
                results[n].append(
                    (time.perf_counter() - t0) / (opt.iters * opt.scan))
                state[n] = (a, b, acc)

        base = sorted(results["cat"])[len(results["cat"]) // 2]
        for n, ts in results.items():
            med = sorted(ts)[len(ts) // 2]
            print(f"  {name} {n:>5s}: {med * 1e3:7.3f} ms/conv-iter  "
                  f"{base / med:.3f}x vs cat")


if __name__ == "__main__":
    main()
