"""Miscellaneous utilities with reference parity.

seed_everything — reference utils/utils.py:182-189 (JAX PRNG is explicit, so
this seeds the host-side numpy/python RNGs the data pipeline uses and returns
a jax PRNG key).
profile_trace — jax.profiler wrapper, the TPU-native upgrade of the
reference's ad-hoc time.time() spans (reference model.py:254-256; SURVEY §5).
nan_debug — toggles jax NaN checking (the reference has no sanitizer story;
this is the functional-JAX analog, SURVEY §5).
"""

from __future__ import annotations

import contextlib
import os
import random
import time
from typing import Iterator, Optional

import numpy as np


def seed_everything(seed: int = 42):
    """Seed host RNGs and return a jax PRNGKey for device-side randomness.

    NOTE: str/bytes hash randomization CANNOT be seeded here — the
    interpreter reads PYTHONHASHSEED once at startup, so setting it at
    runtime is a no-op (the reference's seed_everything, utils/utils.py:182,
    has the same dead assignment; we drop it). Nothing in this codebase
    depends on hash ordering; if a caller's does, export PYTHONHASHSEED in
    the launching environment."""
    random.seed(seed)
    np.random.seed(seed)
    import jax
    return jax.random.PRNGKey(seed)


def enable_compile_cache(cache_dir: Optional[str] = None) -> None:
    """Point jax at a persistent on-disk compilation cache so repeated CLI
    runs (train resume, detect, server restarts) skip the multi-minute
    remote compile of the full pipeline. Safe no-op on jax versions without
    the knobs. Default location: .jax_cache next to the repo root (the same
    cache bench.py and the test suite warm)."""
    import jax
    if cache_dir is None:
        # explicit env override wins (lets a driver/CI point every entry
        # point at its own cache, and lets cold-compile measurements use
        # an empty dir without touching the repo cache)
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR") \
            or os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


@contextlib.contextmanager
def profile_trace(logdir: Optional[str] = None) -> Iterator[None]:
    """Capture a jax.profiler trace (view in TensorBoard / xprof). If logdir
    is None, falls back to a timed span printed to stdout."""
    import jax

    if logdir:
        jax.profiler.start_trace(logdir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()
    else:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            print(f"[profile] span took {time.perf_counter() - t0:.3f}s")


def nan_debug(enable: bool = True) -> None:
    """Turn on jax NaN checking (every op output checked; slow — debug only)."""
    import jax
    jax.config.update("jax_debug_nans", enable)


class StepTimer:
    """Per-step wall-clock timing with EMA, for train-loop observability."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema: Optional[float] = None
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.ema = dt if self.ema is None else \
            self.alpha * dt + (1 - self.alpha) * self.ema
        return dt
