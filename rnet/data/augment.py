"""On-device image augmentation: random crop + small rotation, gather-free.

The reference rotates each image ~+-2.8 degrees with PIL and crops with
torchvision in loader workers (SURVEY.md 2.5). At TPU training rates
host-side augmentation cannot feed the chip, and the naive on-device
formulations (vmapped dynamic_slice crops, bilinear-resample rotation) lower
to gathers — measured 78 ms and 606 ms per 512-batch on v5e, 30x the whole
training step. TPU-native formulations instead:

  * rotation = three-shear decomposition (Paeth). Each shear displaces rows
    (or columns) by a LINEAR function of the perpendicular coordinate; for
    small angles the displacement spans only a few pixels, so a shear is a
    weighted sum of a handful of jnp.roll copies with per-sample hat-function
    weights — pure VPU elementwise work, no gathers. Exact linear
    interpolation of the shear; wrap-around artifacts are confined to a
    <=4 px border (the reference fills rotated corners too).
  * random crop = per-GROUP offsets: the batch splits into `groups` chunks,
    each cropped with one dynamic_slice. Samples in a chunk share the offset
    for that step (fresh offsets every step); 32 slices instead of B gathers.

Angles/offsets come from the step's dropout RNG, so augmentation is
reproducible from the training seed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rotate_bilinear(img: jnp.ndarray, angle_rad: jnp.ndarray) -> jnp.ndarray:
    """Reference rotation (gather-based bilinear resample) — oracle for tests.

    Rotate one (S, S, C) float image about its center; edge-clamped.
    """
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


def _shear(images: jnp.ndarray, shifts: jnp.ndarray, axis: int, k_max: int) -> jnp.ndarray:
    """Displace along `axis` by per-sample, per-line fractional `shifts`.

    images: (B, H, W, C); shifts: (B, L) where L is the size of the axis
    PERPENDICULAR to the displacement (rows for axis=2, columns for axis=1).
    out[..., p, ...] = sum_k hat(shift - k) * roll(images, k, axis): linear
    interpolation as a sum of 2*k_max+1 rolled copies.
    """
    if axis == 2:  # horizontal displacement, varying per row
        w_shape = (images.shape[0], shifts.shape[1], 1, 1)
    elif axis == 1:  # vertical displacement, varying per column
        w_shape = (images.shape[0], 1, shifts.shape[1], 1)
    else:
        raise ValueError(axis)
    out = jnp.zeros_like(images)
    for k in range(-k_max, k_max + 1):
        w = jnp.maximum(0.0, 1.0 - jnp.abs(shifts - k)).reshape(w_shape)
        out = out + w.astype(images.dtype) * jnp.roll(images, k, axis=axis)
    return out


def rotate_shear_batch(images: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """Per-sample small rotation via the three-shear decomposition.

    images: (B, S, S, C) float; angles: (B,) radians (small, ~<0.1 rad).
    rot(theta) = shear_x(-tan(theta/2)) . shear_y(sin(theta)) . shear_x(-tan(theta/2))
    """
    B, H, W, _ = images.shape
    # sign matches rotate_bilinear's convention (positive = PIL's positive)
    a = jnp.tan(angles / 2.0)  # (B,)
    b = -jnp.sin(angles)
    rows = jnp.arange(H, dtype=images.dtype) - (H - 1) / 2.0
    cols = jnp.arange(W, dtype=images.dtype) - (W - 1) / 2.0
    sx = a[:, None] * rows[None, :]  # (B, H) horizontal shift per row
    sy = b[:, None] * cols[None, :]  # (B, W) vertical shift per column
    # static roll radius from the max representable angle (3 deg @ S<=160)
    import math

    kx = math.ceil(0.0265 * max(H, W) / 2) + 1
    ky = math.ceil(0.0525 * max(H, W) / 2) + 1
    out = _shear(images, sx, axis=2, k_max=kx)
    out = _shear(out, sy, axis=1, k_max=ky)
    out = _shear(out, sx, axis=2, k_max=kx)
    return out


def random_rotate_batch(
    images: jnp.ndarray,  # (B, S, S, C) float in [0, 1]
    rng: jax.Array,
    max_deg: float = 2.8,
) -> jnp.ndarray:
    """Per-sample random rotation in [-max_deg, +max_deg] (gather-free)."""
    B = images.shape[0]
    angles = jax.random.uniform(
        rng, (B,), minval=-max_deg, maxval=max_deg
    ) * (jnp.pi / 180.0)
    return rotate_shear_batch(images, angles.astype(images.dtype))


def random_crop_batch(
    images: jnp.ndarray,  # (B, S+2p, S+2p, C), any dtype
    rng: jax.Array,
    out_size: int,
    groups: int = 32,
) -> jnp.ndarray:
    """Crop jitter with per-group offsets (one dynamic_slice per group)."""
    B, S, _, C = images.shape
    margin = S - out_size
    G = groups
    while B % G:
        G //= 2
    G = max(G, 1)
    offs = jax.random.randint(rng, (G, 2), 0, margin + 1)
    grouped = images.reshape(G, B // G, S, S, C)
    crops = [
        jax.lax.dynamic_slice(
            grouped[g], (0, offs[g, 0], offs[g, 1], 0), (B // G, out_size, out_size, C)
        )
        for g in range(G)
    ]
    return jnp.concatenate(crops, axis=0)


def center_crop_batch(images: jnp.ndarray, out_size: int) -> jnp.ndarray:
    p = (images.shape[1] - out_size) // 2
    return images[:, p : p + out_size, p : p + out_size, :]
