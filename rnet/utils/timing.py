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


def device_loop_time(
    make_loop: Callable[[int], Callable],
    k1: int | None = None,
    k2: int | None = None,
    repeats: int = 3,
    target_s: float = 2.0,
):
    """Seconds per step via differenced device-side loops.

    make_loop(K) must return a zero-arg callable that dispatches one jitted
    K-step loop and returns a jax scalar to fetch.

    K auto-scales (round-2 audit, scripts/audit_timing.py): the differenced
    compute time k2-k1 steps must DOMINATE the ~0.2 s dispatch+fetch constant
    on the tunneled backend, or noise in the constant swamps the signal —
    the fixed k1=4/k2=20 round-1 protocol under-measured a 0.55 ms kernel by
    49%. With auto-K the differencing agrees with a single 5000-step
    wall-clock run to <1%.
    """
    if k1 is None or k2 is None:
        # differenced probe: a raw T(K)/K estimate is dominated by the ~0.2 s
        # dispatch constant for ms-scale steps, which would pick K far too
        # small. (T(96)-T(16))/80 cancels the constant; it only needs to be
        # right to ~2x for K selection. The probe difference itself sits in
        # the noise-dominated regime, so guard against dispatch hiccups
        # (min-of-3, and the per-step time can never exceed T(96)/96 with the
        # constant included): a negative/absurd difference falls back to that
        # upper bound rather than producing a pathological K. The k2 cap
        # bounds worst-case probe cost; measurements we care about are
        # >=0.1 ms/step, where cap and target never conflict.
        pa, pb = make_loop(16), make_loop(96)
        float(pa())  # compile
        float(pb())
        ta = min(_run(pa) for _ in range(3))
        tb = min(_run(pb) for _ in range(3))
        k1, k2 = _pick_k(ta, tb, target_s)
    f1, f2 = make_loop(k1), make_loop(k2)
    float(f1())  # compile
    float(f2())
    t1 = min(_run(f1) for _ in range(repeats))
    t2 = min(_run(f2) for _ in range(repeats))
    return max((t2 - t1) / (k2 - k1), 1e-9)


def _pick_k(ta: float, tb: float, target_s: float) -> tuple[int, int]:
    """(k1, k2) from the probe times T(16)=ta, T(96)=tb (pure; unit-tested)."""
    est_ub = tb / 96  # per-step can never exceed this (constant included)
    est = (tb - ta) / 80
    if not (0 < est <= est_ub):
        est = est_ub  # dispatch hiccup poisoned the difference
    k2 = int(min(max(target_s / est, 64), 50_000))
    return max(k2 // 5, 1), k2


def _run(f):
    t0 = time.perf_counter()
    float(f())
    return time.perf_counter() - t0


def bench_train_steps(jit_loop, state, batch, k1: int | None = None, k2: int | None = None, repeats: int = 3):
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
