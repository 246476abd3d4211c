#!/usr/bin/env python
"""Int8 static-quantized pairwise forward vs bf16 (inference).

Round-1's dynamic per-tile quantization lost 0.64x to bf16 (max-reduce +
rescale VPU passes per layer). Round 2 folds statically-calibrated scales
into the surrounding arithmetic (see pairwise._fwd_kernel_int8); this
script measures the honest win/loss at the flagship shape and at H=512
where the matmuls amortize quantization better, plus the argmax-agreement
accuracy check through a random f head.

Usage: PYTHONPATH=/root/.axon_site:. JAX_PLATFORMS=axon python scripts/bench_int8.py
"""

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from rnet.kernels.pairwise import (  # noqa: E402
    pairwise_core,
    pairwise_core_int8,
    pairwise_core_reference,
)
from rnet.utils.timing import device_loop_time  # noqa: E402


def inputs(B, n, H, L, seed=0):
    ks = jax.random.split(jax.random.key(seed), 6)
    u = jax.random.normal(ks[0], (B, n, H), jnp.bfloat16) * 0.3
    v = jax.random.normal(ks[1], (B, n, H), jnp.bfloat16) * 0.3
    s = jax.random.normal(ks[2], (B, H), jnp.bfloat16) * 0.1
    qa = jnp.zeros((B, H), jnp.bfloat16)
    ws = (jax.random.normal(ks[4], (L - 1, H, H)) / np.sqrt(H)).astype(jnp.bfloat16)
    bs = (jax.random.normal(ks[5], (L - 1, H)) * 0.05).astype(jnp.bfloat16)
    return u, v, s, qa, ws, bs


def mk_loop(core_fn, args):
    u = args[0]

    @partial(jax.jit, static_argnums=(1,))
    def loop(u0, K):
        def body(i, carry):
            uc, acc = carry
            out = core_fn(uc, *args[1:])
            uc = uc + (out.sum() * 0.0).astype(uc.dtype)
            return (uc, acc + out.sum())

        _, acc = jax.lax.fori_loop(0, K, body, (u0, jnp.float32(0)))
        return acc

    return lambda K: (lambda: loop(u, K))


def bench_shape(B, n, H, L):
    args = inputs(B, n, H, L)
    bf = lambda *a: pairwise_core(*a, inject=0)
    i8 = lambda *a: pairwise_core_int8(*a, inject=0)
    t_bf = device_loop_time(mk_loop(bf, args))
    t_i8 = device_loop_time(mk_loop(i8, args))
    # accuracy: relative error + argmax agreement through a random head
    ref = pairwise_core_reference(*args, inject=0)
    o8 = pairwise_core_int8(*args, inject=0)
    rel = float(jnp.abs(o8 - ref).max() / (jnp.abs(ref).max() + 1e-9))
    head = jax.random.normal(jax.random.key(9), (H, 28), jnp.float32) / np.sqrt(H)
    agree = float(jnp.mean((ref @ head).argmax(-1) == (o8 @ head).argmax(-1)))
    print(
        f"B={B} n={n} H={H} L={L}: bf16 {t_bf*1e3:.3f} ms | int8 {t_i8*1e3:.3f} ms "
        f"| int8/bf16 speedup {t_bf/t_i8:.2f}x | max rel err {rel:.4f} "
        f"| argmax agree {agree:.3f}"
    )
    return t_bf / t_i8


def main():
    print(f"backend: {jax.default_backend()}")
    bench_shape(64, 64, 256, 4)   # flagship original-fp shape
    bench_shape(64, 64, 512, 4)   # wide: quantization amortizes best here


if __name__ == "__main__":
    main()
