"""ConvInputModel: the 4-layer strided conv feature extractor.

Reference parity (SURVEY.md 2.1, reference model.py ~L10-35): each layer is
Conv2d(24, k=3, stride=2, pad=1) -> BatchNorm -> ReLU; (B,128,128,3) ->
(B,8,8,24). TPU-native choices: NHWC layout (XLA:TPU's preferred conv layout),
bf16 conv compute with fp32 BatchNorm statistics, layer count/width from
config (the 3-layer variant yields the 16x16 stretch grid).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from .initializers import torch_bias, torch_linear_kernel


class ConvInputModel(nn.Module):
    channels: Tuple[int, ...] = (24, 24, 24, 24)
    kernel: int = 3
    stride: int = 2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, S, S, 3) float in [0,1] -> (B, g, g, C)."""
        pad = self.kernel // 2
        for i, ch in enumerate(self.channels):
            fan_in = x.shape[-1] * self.kernel * self.kernel
            x = nn.Conv(
                ch,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=[(pad, pad), (pad, pad)],
                kernel_init=torch_linear_kernel,
                bias_init=torch_bias(fan_in),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"conv{i}",
            )(x)
            # BatchNorm statistics in fp32 (bf16 variance is numerically poor).
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=jnp.float32,
                name=f"bn{i}",
            )(x.astype(jnp.float32))
            x = nn.relu(x).astype(self.dtype)
        return x
