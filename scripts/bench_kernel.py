#!/usr/bin/env python
"""Kernel microbenchmarks on the current backend (run on TPU).

Measures the fused Pallas pairwise kernel vs the decomposed-XLA path, forward
and forward+backward, via device-side loop differencing (rnet.utils.timing).

Usage: PYTHONPATH=. python scripts/bench_kernel.py [B n H L]
"""

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from rnet.kernels.pairwise import pairwise_core
from rnet.utils.timing import device_loop_time


def main():
    args = [int(a) for a in sys.argv[1:]] or []
    B, n, H, L = (args + [64, 64, 256, 4])[:4]
    ks = jax.random.split(jax.random.key(0), 6)
    u = jax.random.normal(ks[0], (B, n, H), jnp.bfloat16) * 0.3
    v = jax.random.normal(ks[1], (B, n, H), jnp.bfloat16) * 0.3
    s = jax.random.normal(ks[2], (B, H), jnp.bfloat16) * 0.1
    qa = jnp.zeros((B, H), jnp.bfloat16)
    ws = (jax.random.normal(ks[4], (L - 1, H, H)) / np.sqrt(H)).astype(jnp.bfloat16)
    bs = (jax.random.normal(ks[5], (L - 1, H)) * 0.05).astype(jnp.bfloat16)
    flops = 2 * B * n * n * ((L - 1) * H * H + H)

    def xla_path(u, v, s, qa, ws, bs):
        a = jax.nn.relu(
            u[:, :, None, :] + v[:, None, :, :] + s[:, None, None, :]
        ).reshape(B, n * n, H)
        for l in range(1, L):
            a = jax.nn.relu(a @ ws[l - 1] + bs[l - 1][None, None, :])
        return a.sum(1).astype(jnp.float32)

    def mk_loop(core_fn):
        @partial(jax.jit, static_argnums=(1,))
        def loop(u0, K):
            def body(i, carry):
                uc, acc = carry
                out = core_fn(uc, v, s, qa, ws, bs)
                uc = uc + (out.sum() * 0.0).astype(uc.dtype)
                return (uc, acc + out.sum())

            _, acc = jax.lax.fori_loop(0, K, body, (u0, jnp.float32(0)))
            return acc

        return loop

    def mk_grad_loop(core_fn):
        # value_and_grad with the VALUE consumed: with a custom-VJP core the
        # residuals are the raw inputs, so a grad-only loop lets XLA DCE the
        # forward pallas_call entirely (round-1 "fwd+bwd" numbers measured
        # backward-only for pallas while the XLA path kept its forward).
        g = jax.value_and_grad(lambda *a: core_fn(*a).sum(), argnums=(0, 4))

        @partial(jax.jit, static_argnums=(1,))
        def loop(u0, K):
            def body(i, carry):
                uc, acc = carry
                val, (du, dws) = g(uc, v, s, qa, ws, bs)
                uc = uc + (du.sum() * 0.0).astype(uc.dtype)
                return (uc, acc + val + du.sum() + dws.sum())

            _, acc = jax.lax.fori_loop(0, K, body, (u0, jnp.float32(0)))
            return acc

        return loop

    pall = lambda *a: pairwise_core(*a, inject=0)
    lk, lx = mk_loop(pall), mk_loop(xla_path)
    tk = device_loop_time(lambda K: (lambda: lk(u, K)))
    tx = device_loop_time(lambda K: (lambda: lx(u, K)))
    print(
        f"fwd pallas: {tk*1e3:.3f} ms ({flops/tk/1e12:.1f} TF/s) | "
        f"xla: {tx*1e3:.3f} ms ({flops/tx/1e12:.1f} TF/s) | speedup {tx/tk:.2f}x"
    )
    gk, gx = mk_grad_loop(pall), mk_grad_loop(xla_path)
    tgk = device_loop_time(lambda K: (lambda: gk(u, K)))
    tgx = device_loop_time(lambda K: (lambda: gx(u, K)))
    # FLOP model: fwd = 3 matmul passes over B*n^2 pair rows; bwd = recompute
    # (3) + dW/dx per layer (6) = 3x fwd; fwd+bwd = 4x fwd matmul FLOPs.
    gflops = 4 * 2 * B * n * n * (L - 1) * H * H + 2 * B * n * n * H
    print(
        f"fwd+bwd pallas: {tgk*1e3:.3f} ms ({gflops/tgk/1e12:.1f} TF/s) | "
        f"xla: {tgx*1e3:.3f} ms ({gflops/tgx/1e12:.1f} TF/s) | "
        f"speedup {tgx/tgk:.2f}x"
    )


if __name__ == "__main__":
    main()
