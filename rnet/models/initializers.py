"""PyTorch-default weight initializers, for training-dynamics parity.

The reference relies on torch's module defaults (SURVEY.md section 2):
Linear/Conv2d use kaiming-uniform(a=sqrt(5)) for weights, which reduces to
U(-1/sqrt(fan_in), 1/sqrt(fan_in)), and the same bound for biases; LSTM uses
U(-1/sqrt(hidden), 1/sqrt(hidden)) everywhere; Embedding uses N(0, 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def torch_linear_kernel(key, shape, dtype=jnp.float32):
    """U(+-1/sqrt(fan_in)); flax kernel shape (in, out) or conv (kh,kw,in,out)."""
    fan_in = 1
    for d in shape[:-1]:
        fan_in *= d
    bound = 1.0 / (fan_in ** 0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias(fan_in: int):
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def lstm_uniform(hidden: int):
    bound = 1.0 / (hidden ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def embedding_normal(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)
