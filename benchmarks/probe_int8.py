"""Probe: does XLA lower int8 matmul/conv to the TPU MXU int8 path?

TPU v5e lists 394 int8 TOPS vs 197 bf16 TFLOPS — if an int8 dot/conv with
preferred_element_type=int32 runs ~2x the bf16 rate, a PTQ int8 serving mode
is worth building; if it runs slower (upcast fallback), it is not.

Methodology follows benchmarks/healthcheck.py: dependency-chained iterations,
distinct on-device inputs, final scalar fetch. Compare the bf16 and int8
rates from the SAME run (same chip window) — absolute numbers flap with the
tunnel, the ratio is the signal.
"""

import json
import time

import jax
import jax.numpy as jnp
from jax import lax


def _time_chain(fn, x0, iters=24):
    x = fn(x0)  # compile + warm
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    x = x0
    for _ in range(iters):
        x = fn(x)
    _ = float(jnp.sum(x[..., 0].astype(jnp.float32)))  # forced scalar fetch
    return (time.perf_counter() - t0) / iters


def main(n=4096, iters=24, verbose=True):
    k = jax.random.PRNGKey(0)
    a_f = jax.jit(lambda k: jax.random.normal(k, (n, n), jnp.bfloat16))(k)
    a_i = jax.jit(lambda k: jax.random.randint(
        k, (n, n), -127, 127, jnp.int8))(k)
    jax.block_until_ready((a_f, a_i))

    @jax.jit
    def mm_bf16(x):
        y = lax.dot(x, x, preferred_element_type=jnp.float32)
        return (y / jnp.float32(n)).astype(jnp.bfloat16)  # renormalize chain

    @jax.jit
    def mm_int8(x):
        y = lax.dot(x, x, preferred_element_type=jnp.int32)
        return jnp.clip(y >> 12, -127, 127).astype(jnp.int8)

    t_bf16 = _time_chain(mm_bf16, a_f, iters)
    t_int8 = _time_chain(mm_int8, a_i, iters)
    flops = 2.0 * n * n * n
    out = {
        "bf16_tflops": round(flops / t_bf16 / 1e12, 1),
        "int8_tops": round(flops / t_int8 / 1e12, 1),
        "int8_speedup": round(t_bf16 / t_int8, 2),
        "device": jax.devices()[0].device_kind,
    }

    # conv probe: 3x3 int8 conv vs bf16 conv on a detector-like shape
    xf = jax.jit(lambda k: jax.random.normal(
        k, (8, 80, 80, 192), jnp.bfloat16))(k)
    xi = jax.jit(lambda k: jax.random.randint(
        k, (8, 80, 80, 192), -127, 127, jnp.int8))(k)
    wf = jax.jit(lambda k: jax.random.normal(
        k, (3, 3, 192, 192), jnp.bfloat16))(k)
    wi = jax.jit(lambda k: jax.random.randint(
        k, (3, 3, 192, 192), -127, 127, jnp.int8))(k)
    jax.block_until_ready((xf, xi, wf, wi))
    dn = lax.conv_dimension_numbers(xf.shape, wf.shape,
                                    ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def conv_bf16(x):
        y = lax.conv_general_dilated(x, wf, (1, 1), "SAME", dimension_numbers=dn,
                                     preferred_element_type=jnp.float32)
        return (y / jnp.float32(42)).astype(jnp.bfloat16)

    @jax.jit
    def conv_int8(x):
        y = lax.conv_general_dilated(x, wi, (1, 1), "SAME", dimension_numbers=dn,
                                     preferred_element_type=jnp.int32)
        return jnp.clip(y >> 12, -127, 127).astype(jnp.int8)

    t_cf = _time_chain(conv_bf16, xf, iters)
    t_ci = _time_chain(conv_int8, xi, iters)
    cflops = 2.0 * 8 * 80 * 80 * 192 * 192 * 9
    out.update({
        "conv_bf16_tflops": round(cflops / t_cf / 1e12, 1),
        "conv_int8_tops": round(cflops / t_ci / 1e12, 1),
        "conv_int8_speedup": round(t_cf / t_ci, 2),
    })
    if verbose:
        print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
