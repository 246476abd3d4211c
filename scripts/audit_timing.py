#!/usr/bin/env python
"""Timing-protocol audit: cross-validate device_loop_time against long runs.

Round-1 kernel numbers disagreed across docs (244 / 193 / 100 TF/s for the
same forward) because the k1=4/k2=20 differencing protocol measures ~7 ms of
differenced compute against a ~200 ms dispatch+fetch constant on this
tunneled backend — noise in the constant swamps the signal, and min-of-2
differencing can even produce negative-biased (impossibly fast) estimates.

This script times the fused pairwise kernel forward (B=64, n=64, H=256, L=4,
bf16 — the documented microbenchmark shape) under several protocols:

  A. round-1 protocol:  (T(20)-T(4))/16, repeats=2      [the buggy one]
  B. large-K differencing: (T(5K)-T(1K))/4K, repeats=3  [dispatch cancels AND
                                                         compute dominates]
  C. single long dispatch: T(5K)/5K                     [upper bound: includes
                                                         dispatch/fetch once]

B and C must agree to a few percent for the protocol to be trusted; the final
TF/s number uses B and must be <= the v5e bf16 peak (~197 TF/s dense).

Usage: PYTHONPATH=/root/.axon_site JAX_PLATFORMS=axon python scripts/audit_timing.py
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from rnet.kernels.pairwise import pairwise_core  # noqa: E402

V5E_BF16_PEAK_TFLOPS = 197.0


def make_inputs(B=64, n=64, H=256, L=4):
    ks = jax.random.split(jax.random.key(0), 6)
    u = jax.random.normal(ks[0], (B, n, H), jnp.bfloat16) * 0.3
    v = jax.random.normal(ks[1], (B, n, H), jnp.bfloat16) * 0.3
    s = jax.random.normal(ks[2], (B, H), jnp.bfloat16) * 0.1
    qa = jnp.zeros((B, H), jnp.bfloat16)
    ws = (jax.random.normal(ks[4], (L - 1, H, H)) / np.sqrt(H)).astype(jnp.bfloat16)
    bs = (jax.random.normal(ks[5], (L - 1, H)) * 0.05).astype(jnp.bfloat16)
    flops = 2 * B * n * n * ((L - 1) * H * H + H)
    return (u, v, s, qa, ws, bs), flops


def make_loop(core_fn, args):
    u, v, s, qa, ws, bs = args

    @partial(jax.jit, static_argnums=(1,))
    def loop(u0, K):
        def body(i, carry):
            uc, acc = carry
            out = core_fn(uc, v, s, qa, ws, bs)
            uc = uc + (out.sum() * 0.0).astype(uc.dtype)  # serialize iterations
            return (uc, acc + out.sum())

        _, acc = jax.lax.fori_loop(0, K, body, (u0, jnp.float32(0)))
        return acc

    return lambda K: (lambda: loop(u, K))


def t_of(f):
    t0 = time.perf_counter()
    float(f())
    return time.perf_counter() - t0


def protocol_A(mk):
    f1, f2 = mk(4), mk(20)
    float(f1()); float(f2())  # compile
    t1 = min(t_of(f1) for _ in range(2))
    t2 = min(t_of(f2) for _ in range(2))
    return (t2 - t1) / 16


def protocol_B(mk, k1=1000, k2=5000, repeats=3):
    f1, f2 = mk(k1), mk(k2)
    float(f1()); float(f2())
    t1 = min(t_of(f1) for _ in range(repeats))
    t2 = min(t_of(f2) for _ in range(repeats))
    return (t2 - t1) / (k2 - k1)


def protocol_C(mk, k=5000):
    f = mk(k)
    float(f())
    return min(t_of(f) for _ in range(2)) / k


def main():
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    args, flops = make_inputs()
    mk = make_loop(lambda *a: pairwise_core(*a, inject=0), args)

    raw = {}
    for name, fn in [("A_r1_k4_20", protocol_A), ("B_longdiff", protocol_B), ("C_single_long", protocol_C)]:
        ts = fn(mk)
        raw[name] = ts
        print(f"{name:>14}: {ts*1e3:8.4f} ms/step   {flops/ts/1e12:7.1f} TF/s   "
              f"{100*flops/ts/1e12/V5E_BF16_PEAK_TFLOPS:5.1f}% of v5e bf16 peak")

    b, c = raw["B_longdiff"], raw["C_single_long"]
    print(f"\nB vs C agreement: {100*abs(b-c)/c:.2f}%  (C includes one dispatch; expect C >= B)")
    a = raw["A_r1_k4_20"]
    print(f"round-1 protocol error vs B: {100*(a-b)/b:+.1f}%")
    tfs = flops / b / 1e12
    ok = tfs <= V5E_BF16_PEAK_TFLOPS
    print(f"\nVERDICT: fused fwd = {b*1e3:.3f} ms, {tfs:.1f} TF/s "
          f"({100*tfs/V5E_BF16_PEAK_TFLOPS:.1f}% of peak) — {'PHYSICAL' if ok else 'IMPOSSIBLE'}")


if __name__ == "__main__":
    main()
