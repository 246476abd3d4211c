"""Fused Pallas TPU kernel: batch gather + crop + rotate + normalize.

Round-1's device pipeline paid ~12 ms per 512-batch outside the model step:
an HBM row gather of the padded uint8 images (image_cache[idx], ~32 MB) plus
the three-shear rotation as ~25 full-batch jnp.roll round-trips through HBM
(rnet/data/augment.py). Both are memory-bound and fuse into ONE pass:

  grid = (B,); per step, the kernel DMAs image idx[b] straight out of the
  HBM-resident cache (scalar-prefetch index_map — the gather never exists as
  a separate op), converts to f32 in VMEM, applies the three-shear rotation
  about the CROP center (per-sample angle), crops at a per-sample offset
  (dynamic pltpu.roll + static slice), and writes the normalized bf16
  128x128x3 crop. HBM traffic = read 62 KB + write 96 KB per sample —
  speed-of-light for the op.

Semantics vs the round-1 XLA path (rnet/data/augment.py, reference
torchvision Pad(8)+RandomCrop+RandomRotation ~2.8 deg — SURVEY.md 2.5):
  * crop offsets are per-SAMPLE (the XLA path grouped samples 32-to-an-offset
    as a gather workaround; per-sample matches the reference exactly).
  * rotation is applied to the padded 144-canvas about the crop's center and
    THEN cropped (the XLA path cropped first). Mathematically the same
    rotation; near the crop border the rotated-in pixels are REAL neighboring
    pixels rather than wrap-around artifacts, i.e. strictly closer to PIL.
  * images are channel-interleaved on the lane axis (144, 432): a horizontal
    shift of k pixels is a lane roll of 3k; shear weights depend only on the
    perpendicular coordinate (rows, or lane//3).

The pure-jnp `gather_augment_reference` implements the identical math (same
shear order, same centers, same hat weights) and is the kernel's test oracle
and the non-TPU fallback.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32

# roll radii covering the shear hat-function support for max 2.8 deg rotation
# of a 144-canvas about any 128-crop center: |r - c| <= 80, so
# |sx| <= 80*tan(1.4 deg) = 1.96 -> KX=2;  |sy| <= 80*sin(2.8 deg) = 3.91 -> KY=4.
MAX_DEG = 2.8
_PAD_CANVAS = 144
IMG_CHANNELS = 3  # CLEVR renders RGB; fixed across the data layer


def pad_flat_cache(images):
    """(N, S, S, C) uint8 -> (N, S, Wp) lane-padded flat form.

    DMA slices must be 128-lane-aligned (Mosaic tiling), and padding inside
    jit would duplicate a multi-GB cache in HBM (OOM at real-CLEVR scale:
    70k x 144^2 x 3 = 4.35 GB). Padding ONCE on the host stores the cache in
    exactly the layout the TPU would pad it to anyway ((8,128)-tiled uint8),
    so the flat form costs no extra HBM over the 4-D form. Consumers:
    the DMA-gather augment kernel reads rows directly; everything else
    goes through unflatten_rows."""
    import numpy as np

    N, S, _, C = images.shape
    W = S * C
    Wp = ((W + 127) // 128) * 128
    flat = np.zeros((N, S, Wp), dtype=np.uint8)
    flat[:, :, :W] = images.reshape(N, S, W)
    return flat


def unflatten_rows(rows):
    """(B, S, Wp) lane-padded flat rows -> (B, S, S, C) images (jit-safe)."""
    B, S, _ = rows.shape
    return rows[:, :, : S * IMG_CHANNELS].reshape(B, S, S, IMG_CHANNELS)


def _shear_radii(canvas: int, out_size: int) -> tuple[int, int]:
    reach = max(out_size / 2 + (canvas - out_size), out_size / 2)
    kx = math.ceil(reach * math.tan(math.radians(MAX_DEG / 2)))
    ky = math.ceil(reach * math.sin(math.radians(MAX_DEG)))
    return kx, ky


def _hat(x):
    return jnp.maximum(0.0, 1.0 - jnp.abs(x))


def _augment_one(img, ang, oy, ox, *, S, out_size, C, kx, ky):
    """Shear-rotate + crop ONE normalized f32 (S, S*C) image (kernel helper)."""
    cy = oy.astype(_F32) + (out_size - 1) / 2.0
    cx = ox.astype(_F32) + (out_size - 1) / 2.0
    a = jnp.tan(ang / 2.0)
    s = -jnp.sin(ang)
    # per-row horizontal shift (rows = sublanes); weight broadcast over lanes
    r = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0).astype(_F32)
    sx = a * (r - cy)  # (S, 1)
    # per-column vertical shift; column = lane // C
    px = (jax.lax.broadcasted_iota(jnp.int32, (1, S * C), 1) // C).astype(_F32)
    sy = s * (px - cx)  # (1, S*C)

    W = S * C  # pltpu.roll wants non-negative shifts: wrap mod axis size

    def shear_x(x):
        out = jnp.zeros_like(x)
        for k in range(-kx, kx + 1):
            out = out + _hat(sx - k) * pltpu.roll(x, (C * k) % W, 1)
        return out

    x1 = shear_x(img)
    x2 = jnp.zeros_like(x1)
    for k in range(-ky, ky + 1):
        x2 = x2 + _hat(sy - k) * pltpu.roll(x1, k % S, 0)
    x3 = shear_x(x2)
    # per-sample crop: dynamic roll to the origin, then a static slice.
    # tpu.dynamic_rotate needs a lane-aligned width: pad W=432 -> 512. The
    # crop never reads wrapped lanes (i + C*ox < W for i < out_size*C), so
    # the pad values are sliced away and wrap semantics don't matter.
    x4 = pltpu.roll(x3, (S - oy) % S, 0)[:out_size, :]
    Wp = ((W + 127) // 128) * 128
    if Wp != W:
        x4 = jnp.concatenate(
            [x4, jnp.zeros((out_size, Wp - W), x4.dtype)], axis=1
        )
    return pltpu.roll(x4, (Wp - C * ox) % Wp, 1)[:, : out_size * C]


def _norm(img_u8):
    # Mosaic has no unsigned->float cast; hop through int32 (values < 256)
    return img_u8.astype(jnp.int32).astype(_F32) * (1.0 / 255.0)


def _augment_kernel(
    idx_ref, ang_ref, off_ref, *refs, S, out_size, C, kx, ky, G
):
    # refs = G image refs (each its own scalar-prefetch-gathered block) + out
    img_refs, out_ref = refs[:G], refs[G]
    b = pl.program_id(0)
    for g in range(G):
        q = b * G + g  # sample index
        out_ref[g] = _augment_one(
            _norm(img_refs[g][0][:, : S * C]),  # drop lane pad if flat form
            ang_ref[q], off_ref[q, 0], off_ref[q, 1],
            S=S, out_size=out_size, C=C, kx=kx, ky=ky,
        ).astype(out_ref.dtype)


def dma_gather_schedule(B: int, G: int, depth: int):
    """Pure event-stream model of `_augment_kernel_dma`'s slot ring.

    Mirrors the kernel's program order exactly — warm-up starts DMAs for
    samples 0..depth-1 into slots 0..depth-1, then per sample q:
    wait(q) on slot q%depth, consume(q) (the VMEM load materializes before
    refill), start(q+depth) into the same slot. The CPU suite replays this
    stream (tests/test_cache_augment.py) and asserts the safety invariants —
    every consume reads its own sample's row; no start overwrites a slot
    whose data has not been consumed — across B/G/depth sweeps including
    tails. The kernel body cannot execute on CPU (manual DMA semaphores have
    no interpret-mode lowering), so this model is its structural oracle:
    keep the two in lockstep when editing either.

    Yields ("start", sample, slot) / ("wait", sample, slot) /
    ("consume", sample, slot) in program order.
    """
    # the kernel warm-starts range(depth) unconditionally and relies on the
    # caller's depth = min(depth, B) clamp (_fused_pallas); model the same
    # contract loudly instead of clamping here and hiding a divergence
    assert depth <= B, f"depth {depth} > B {B}: kernel would DMA idx_ref[d] past the batch"
    for d in range(depth):
        yield ("start", d, d)
    for b in range(B // G):
        for g in range(G):
            q = b * G + g
            slot = q % depth
            yield ("wait", q, slot)
            yield ("consume", q, slot)
            if q + depth < B:
                yield ("start", q + depth, slot)


def _augment_kernel_dma(
    idx_ref, ang_ref, off_ref, hbm_ref, out_ref, scratch, sems,
    *, S, out_size, C, kx, ky, G, depth, B
):
    """Deep-buffered variant: the per-sample image fetch is a manual DMA with
    `depth` requests in flight. The index_map formulation (above) leaves only
    Mosaic's double buffering between the gather and the compute; on large
    HBM-resident caches (multi-GB) the per-DMA latency grows past one grid
    step's compute and the pipeline stalls — depth slots hide ~depth/G steps
    of DMA latency instead of ~1."""
    b = pl.program_id(0)

    def dma(sample, slot):
        return pltpu.make_async_copy(
            hbm_ref.at[sample], scratch.at[slot], sems.at[slot]
        )

    @pl.when(b == 0)
    def _():
        for d in range(depth):  # warm-up: first `depth` samples
            dma(idx_ref[d], d).start()

    for g in range(G):
        q = b * G + g  # sample index
        slot = jax.lax.rem(q, depth)
        dma(idx_ref[q], slot).wait()
        # the cache rows are lane-padded to a 128 multiple (DMA slices must
        # be tile-aligned); the image occupies the first S*C lanes
        img = _norm(scratch[slot][:, : S * C])  # materialize before refill
        nq = q + depth

        @pl.when(nq < B)
        def _():
            dma(idx_ref[nq], slot).start()

        out_ref[g] = _augment_one(
            img, ang_ref[q], off_ref[q, 0], off_ref[q, 1],
            S=S, out_size=out_size, C=C, kx=kx, ky=ky,
        ).astype(out_ref.dtype)


def _fused_pallas(cache, idx, angles, offs, out_size, out_dtype, interpret,
                  group: int = 4, depth: int = 16):
    if cache.ndim == 3:  # pre-padded flat form (pad_flat_cache)
        N, S, Wp = cache.shape
        C = IMG_CHANNELS
        flat = cache
    else:
        N, S, _, C = cache.shape
        Wp = ((S * C + 127) // 128) * 128
        flat = cache.reshape(N, S, S * C)  # minor-dims merge: no relayout
    B = idx.shape[0]
    kx, ky = _shear_radii(S, out_size)
    # G samples per grid step amortize per-step setup/overhead
    G = group if B % group == 0 else 1
    depth = min(depth, B)
    if depth >= 2 * G and not interpret:
        # manual deep-buffered DMA gather (see _augment_kernel_dma). Not
        # lowered in interpret mode (semaphore semantics differ on CPU) —
        # the TPU-mode test run (RNET_TEST_TPU=1 tests/test_cache_augment.py)
        # pins this kernel against the same jnp oracle.
        # DMA slices must be lane-tile-aligned: large caches arrive
        # pre-padded from the host (pad_flat_cache — padding HERE would
        # duplicate them in HBM); 4-D callers (tests, small caches) pad
        # in-jit.
        if flat.shape[2] != Wp:
            flat = jnp.pad(flat, ((0, 0), (0, 0), (0, Wp - flat.shape[2])))
        kern = functools.partial(
            _augment_kernel_dma, S=S, out_size=out_size, C=C, kx=kx, ky=ky,
            G=G, depth=depth, B=B,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # idx, angles, offsets
            grid=(B // G,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (G, out_size, out_size * C), lambda b, *_: (b, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((depth, S, Wp), jnp.uint8),
                pltpu.SemaphoreType.DMA((depth,)),
            ],
        )
        out = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, out_size, out_size * C), out_dtype),
        )(idx, angles.astype(_F32), offs.astype(jnp.int32), flat)
        return out.reshape(B, out_size, out_size, C)

    kern = functools.partial(
        _augment_kernel, S=S, out_size=out_size, C=C, kx=kx, ky=ky, G=G
    )

    def mk_imap(g):
        return lambda b, idx_ref, ang_ref, off_ref: (idx_ref[b * G + g], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # idx, angles, offsets
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((1, S, flat.shape[2]), mk_imap(g)) for g in range(G)
        ],
        out_specs=pl.BlockSpec(
            (G, out_size, out_size * C), lambda b, *_: (b, 0, 0)
        ),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, out_size, out_size * C), out_dtype),
        interpret=interpret,
    )(idx, angles.astype(_F32), offs.astype(jnp.int32), *([flat] * G))
    return out.reshape(B, out_size, out_size, C)


def gather_augment_reference(cache, idx, angles, offs, out_size, out_dtype=jnp.bfloat16):
    """Pure-jnp oracle: identical math to the kernel (shears on the full
    canvas about the crop center, then per-sample crop)."""
    from ..data.augment import _shear

    imgs = cache[idx].astype(_F32) * (1.0 / 255.0)  # (B, S, S, C)
    B, S, _, C = imgs.shape
    kx, ky = _shear_radii(S, out_size)
    ang = angles.astype(_F32)
    cy = offs[:, 0].astype(_F32) + (out_size - 1) / 2.0
    cx = offs[:, 1].astype(_F32) + (out_size - 1) / 2.0
    coord = jnp.arange(S, dtype=_F32)[None, :]
    sx = jnp.tan(ang / 2.0)[:, None] * (coord - cy[:, None])  # (B, S) per row
    sy = -jnp.sin(ang)[:, None] * (coord - cx[:, None])  # (B, S) per column
    x = _shear(imgs, sx, axis=2, k_max=kx)
    x = _shear(x, sy, axis=1, k_max=ky)
    x = _shear(x, sx, axis=2, k_max=kx)

    def crop(one, off):
        return jax.lax.dynamic_slice(one, (off[0], off[1], 0), (out_size, out_size, C))

    return jax.vmap(crop)(x, offs).astype(out_dtype)


def gather_augment(
    cache,  # (N, S, S, C) uint8 HBM-resident, or (N, S, Wp) pad_flat_cache form
    idx,  # (B,) int32 rows to augment
    rng,  # per-step PRNG key
    out_size: int,
    *,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    mesh=None,
    batch_local: bool = False,
):
    """Random crop + rotation, fused with the cache gather. Returns
    (B, out, out, C) normalized [0,1] images in out_dtype.

    Matches the reference's train transform (SURVEY.md 2.5: RandomCrop after
    Pad, RandomRotation ~2.8 deg) with per-sample offsets/angles drawn from
    `rng` — reproducible from the training seed.

    batch_local=True declares `cache` to be THIS BATCH's images (idx is a
    permutation-free arange) rather than a replicated split cache: under a
    multi-device mesh the source then shards over 'data' alongside idx —
    declaring it replicated would all-gather the full image batch onto every
    device each step.
    """
    B = idx.shape[0]
    S = cache.shape[1]
    margin = S - out_size
    kr, kc = jax.random.split(rng)
    angles = jax.random.uniform(
        kr, (B,), minval=-MAX_DEG, maxval=MAX_DEG
    ) * (jnp.pi / 180.0)
    offs = jax.random.randint(kc, (B, 2), 0, margin + 1, jnp.int32)
    on_tpu = jax.default_backend() == "tpu"
    if not (on_tpu or interpret):
        if cache.ndim == 3:  # unflatten the gathered rows only (jit-safe)
            return gather_augment_reference(
                unflatten_rows(cache[idx]), jnp.arange(B), angles, offs,
                out_size, out_dtype,
            )
        return gather_augment_reference(cache, idx, angles, offs, out_size, out_dtype)
    if mesh is not None and mesh.devices.size > 1:
        from jax.sharding import PartitionSpec as P

        data_axes = tuple(a for a in mesh.axis_names if a != "pairs")
        cache_spec = (
            P(data_axes, *([None] * (cache.ndim - 1))) if batch_local else P()
        )

        def f(idx_l, ang_l, off_l, cache_l):
            if batch_local:  # idx_l carries GLOBAL offsets; rows are local
                idx_l = jnp.arange(cache_l.shape[0], dtype=jnp.int32)
            return _fused_pallas(
                cache_l, idx_l, ang_l, off_l, out_size, out_dtype, interpret
            )

        return jax.shard_map(
            f,
            mesh=mesh,
            in_specs=(P(data_axes), P(data_axes), P(data_axes, None), cache_spec),
            out_specs=P(data_axes, None, None, None),
            check_vma=False,
        )(idx, angles, offs, cache)
    return _fused_pallas(cache, idx, angles, offs, out_size, out_dtype, interpret)
