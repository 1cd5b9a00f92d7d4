"""TPU health check — run before trusting any benchmark number.

Prints one JSON line: {"healthy": bool, "matmul_tflops": N, ...}.
A healthy v5e sustains >100 TFLOP/s bf16 on a large matmul chain; the
tunneled chip has been observed degraded ~50x for hours (ROUND1_NOTES.md).
"""

import json
import time

import jax
import jax.numpy as jnp


def main(n: int = 8192, iters: int = 8, verbose: bool = True) -> dict:
    # One jit containing a chain of `iters` matmuls, result fetched as a
    # scalar: the fetch forces true completion (block_until_ready alone has
    # been observed to return early on this relay), and the chain amortizes
    # the fetch round-trip so compute dominates the measurement.
    def chain(a):
        def body(c, _):
            c = jnp.tanh(c @ c) * jnp.bfloat16(0.1)
            return c, ()
        c, _ = jax.lax.scan(body, a, None, length=iters)
        return jnp.sum(c)

    f = jax.jit(chain)
    x = jax.block_until_ready(
        jax.jit(lambda k: jax.random.normal(k, (n, n), jnp.bfloat16))(
            jax.random.PRNGKey(0)))
    float(f(x))  # compile + run
    t0 = time.perf_counter()
    float(f(x * jnp.bfloat16(0.999)))
    dt = (time.perf_counter() - t0) / iters
    tflops = 2 * n ** 3 / dt / 1e12
    result = {
        "healthy": bool(tflops > 100.0),
        "matmul_tflops": round(tflops, 1),
        "ms_per_matmul": round(dt * 1000, 2),
        "device": str(jax.devices()[0]),
    }
    if verbose:
        print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
