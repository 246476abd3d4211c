"""Relay-safe device timing.

On the axon-tunneled TPU backend, jax.block_until_ready can return before
execution finishes, deep dispatch queues collapse throughput, and a host
scalar fetch costs ~40 ms. Accurate step timing therefore runs K steps inside
a single device-side lax.fori_loop (one dispatch, one fetch) and differences
two K values so the constant dispatch+fetch overhead cancels:

    step_time = (T(K2) - T(K1)) / (K2 - K1)
"""

from __future__ import annotations

import time
from typing import Callable


def device_loop_time(make_loop: Callable[[int], Callable], k1: int = 4, k2: int = 20, repeats: int = 2):
    """Seconds per step via differenced device-side loops.

    make_loop(K) must return a zero-arg callable that dispatches one jitted
    K-step loop and returns a jax scalar to fetch.
    """
    f1, f2 = make_loop(k1), make_loop(k2)
    float(f1())  # compile
    float(f2())
    t1 = min(_run(f1) for _ in range(repeats))
    t2 = min(_run(f2) for _ in range(repeats))
    return max((t2 - t1) / (k2 - k1), 1e-9)


def _run(f):
    t0 = time.perf_counter()
    float(f())
    return time.perf_counter() - t0


def bench_train_steps(jit_loop, state, batch, k1: int = 4, k2: int = 20, repeats: int = 2):
    """Seconds per training step; jit_loop(state, batch, K) -> final loss scalar."""

    def make(k):
        return lambda: jit_loop(state, batch, k)

    return device_loop_time(make, k1, k2, repeats)


def bench_fn(f: Callable, *args, iters: int = 24, warmup: int = 3, drain_every: int = 8, scalar_of=None):
    """Legacy wall-clock protocol (shallow pipeline + periodic scalar drains).

    Prefer device_loop_time for sub-10ms kernels; this is fine for >50ms work.
    """
    import jax

    def drain(out):
        x = scalar_of(out) if scalar_of is not None else jax.tree.leaves(out)[0]
        if getattr(x, "ndim", 0):
            x = x.ravel()[0]
        return float(x)

    out = None
    for _ in range(warmup):
        out = f(*args)
    drain(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = f(*args)
        if (i + 1) % drain_every == 0:
            drain(out)
    drain(out)
    return (time.perf_counter() - t0) / iters
