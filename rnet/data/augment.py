"""On-device image augmentation: small random rotation, fused into the step.

The reference rotates each image ~+-2.8 degrees with PIL in loader workers
(SURVEY.md 2.5). At TPU training rates host-side rotation is the pipeline
bottleneck, so it runs on device instead: a vmapped bilinear affine resample
(pure gathers + FMAs, fuses into the input normalization). Applied only in
training; angles come from the step's dropout RNG stream, so augmentation is
reproducible from the training seed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rotate_bilinear(img: jnp.ndarray, angle_rad: jnp.ndarray) -> jnp.ndarray:
    """Rotate one (S, S, C) float image about its center, edge-padded."""
    S = img.shape[0]
    c = (S - 1) / 2.0
    ys, xs = jnp.meshgrid(jnp.arange(S) - c, jnp.arange(S) - c, indexing="ij")
    cos, sin = jnp.cos(angle_rad), jnp.sin(angle_rad)
    src_y = sin * xs + cos * ys + c
    src_x = cos * xs - sin * ys + c
    y0 = jnp.clip(jnp.floor(src_y), 0, S - 2).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(src_x), 0, S - 2).astype(jnp.int32)
    wy = jnp.clip(src_y - y0, 0.0, 1.0)[..., None]
    wx = jnp.clip(src_x - x0, 0.0, 1.0)[..., None]
    g = lambda yy, xx: img[yy, xx]
    top = g(y0, x0) * (1 - wx) + g(y0, x0 + 1) * wx
    bot = g(y0 + 1, x0) * (1 - wx) + g(y0 + 1, x0 + 1) * wx
    return top * (1 - wy) + bot * wy


def random_rotate_batch(
    images: jnp.ndarray,  # (B, S, S, C) float in [0, 1]
    rng: jax.Array,
    max_deg: float = 2.8,
) -> jnp.ndarray:
    """Per-sample random rotation in [-max_deg, +max_deg]."""
    B = images.shape[0]
    angles = jax.random.uniform(
        rng, (B,), minval=-max_deg, maxval=max_deg
    ) * (jnp.pi / 180.0)
    return jax.vmap(rotate_bilinear)(images, angles)
