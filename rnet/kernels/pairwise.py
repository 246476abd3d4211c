"""Fused Pallas TPU kernel for the O(n^2) pairwise g_theta core.

This is the TPU-native answer to the reference's pair-expansion hot spot
(SURVEY.md 3.3: the (B, 4096, 2c+h) pair tensor the reference materializes in
GPU HBM — and BASELINE.json's requirement that we never materialize it).

Decomposition (see models/relational.py): since concatenation feeds a linear
layer, g layer 0 factors into per-object projections
    u = x @ W0[:c],  v = x @ W0[c:2c],  per-sample shift s = b0 (+ q @ W0q),
so the pair row for (i, j) enters the MLP as relu(u_i + v_j + s). Question
injection at layer p > 0 likewise reduces to a per-sample additive term
qa = q @ Wq_p. The kernel therefore only handles the n^2-heavy part:

    out[b] = sum_{i,j} gL(...g1(relu(u_i + v_j + s))...)        (B, H)

Grid: (B, n/TI); each step processes a TI x TJ tile of (i, j) pairs entirely
in VMEM — activations never touch HBM. Sum-pooling is associative, so the
running (1, H) accumulator is exact. The custom VJP recomputes tile
activations in the backward (flash-attention-style recompute): dW/db/ds/dqa
accumulate in fp32 VMEM blocks revisited across the sequential TPU grid;
du/dv stream out per (b, i)-tile.

The thin projections (x->u,v; q->qa; dx, dq, dW0) stay in XLA outside the
custom_vjp boundary, so autodiff handles them for free.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32


# ---------------------------------------------------------------------------
# Reference (pure jnp) core — used on non-TPU backends and as the test oracle.
# ---------------------------------------------------------------------------


def pairwise_core_reference(u, v, s, qa, ws, bs, inject: int):
    """out[b] = sum_{i,j} g-chain(relu(u[b,i] + v[b,j] + s[b])).

    Rectangular: u may hold a subset of the i-objects (ni rows) while v holds
    all nj — the pair-axis-sharded case.
    """
    B, ni, H = u.shape
    nj = v.shape[1]
    a = jax.nn.relu(u[:, :, None, :] + v[:, None, :, :] + s[:, None, None, :])
    a = a.reshape(B, ni * nj, H)
    L = ws.shape[0] + 1
    for l in range(1, L):
        pre = a @ ws[l - 1] + bs[l - 1][None, None, :]
        if l == inject:
            pre = pre + qa[:, None, :]
        a = jax.nn.relu(pre)
    return a.sum(axis=1).astype(_F32)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _pair_mask(seed_ref, b_idx, it, jt, rows: int, keep: float):
    """Per-pair keep mask in {0,1}^(rows,1) from the on-chip PRNG.

    Seeded by (step seed, grid coords, j-tile), so forward and backward
    regenerate the identical mask. Built with sign() arithmetic — no i1
    vectors (Mosaic bool-relayout limitation).
    """
    pltpu.prng_seed(seed_ref[0, 0] + (b_idx * 16384 + it) * 64 + jt)
    bits = pltpu.bitcast(pltpu.prng_random_bits((rows, 1)), jnp.int32)
    bits_f = bits.astype(_F32)  # uniform over [-2^31, 2^31)
    thresh = (keep - 0.5) * 4294967296.0
    return jnp.clip(jnp.sign(thresh - bits_f), 0.0, 1.0)


def _fwd_kernel(
    seed_ref, u_ref, v_ref, s_ref, qa_ref, w_ref, b_ref, out_ref,
    *, L, inject, TI, TJ, nj, keep,
):
    b_idx = pl.program_id(0)
    it = pl.program_id(1)

    @pl.when(it == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    cdt = u_ref.dtype
    u = u_ref[0]  # (TI, H)
    s = s_ref[0, 0]  # (1, 1, H) block -> (H,)
    acc = jnp.zeros((out_ref.shape[-1],), _F32)
    for jt in range(nj // TJ):
        vblk = v_ref[0, jt * TJ : (jt + 1) * TJ, :]  # (TJ, H)
        pre0 = (
            u[:, None, :].astype(_F32)
            + vblk[None, :, :].astype(_F32)
            + s[None, None, :].astype(_F32)
        )
        a = jax.nn.relu(pre0).reshape(TI * TJ, u.shape[-1]).astype(cdt)
        for l in range(1, L):
            pre = jnp.dot(a, w_ref[l - 1], preferred_element_type=_F32)
            pre = pre + b_ref[l - 1][None, :].astype(_F32)
            if l == inject:
                pre = pre + qa_ref[0, 0][None, :].astype(_F32)
            a = jax.nn.relu(pre).astype(cdt)
        a32 = a.astype(_F32)
        if keep < 1.0:  # inverted pair dropout (BASELINE config #3)
            mask = _pair_mask(seed_ref, b_idx, it, jt, TI * TJ, keep)
            a32 = a32 * (mask * (1.0 / keep))
        acc = acc + jnp.sum(a32, axis=0)
    out_ref[0, 0] += acc


def _bwd_kernel(
    seed_ref, u_ref, v_ref, s_ref, qa_ref, w_ref, b_ref, g_ref,
    du_ref, dv_ref, ds_ref, dqa_ref, dw_ref, db_ref,
    *, L, inject, TI, TJ, nj, keep,
):
    b_idx = pl.program_id(0)
    it = pl.program_id(1)

    @pl.when((b_idx == 0) & (it == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    @pl.when(it == 0)
    def _():
        dv_ref[...] = jnp.zeros_like(dv_ref)
        ds_ref[...] = jnp.zeros_like(ds_ref)
        dqa_ref[...] = jnp.zeros_like(dqa_ref)

    cdt = u_ref.dtype
    H = u_ref.shape[-1]
    u = u_ref[0]
    s = s_ref[0, 0]
    g = g_ref[0, 0].astype(_F32)  # (H,) upstream grad of the pooled sum
    du_acc = jnp.zeros((TI, H), _F32)
    for jt in range(nj // TJ):
        vblk = v_ref[0, jt * TJ : (jt + 1) * TJ, :]
        # --- recompute forward activations for this tile ---
        pre0 = (
            u[:, None, :].astype(_F32)
            + vblk[None, :, :].astype(_F32)
            + s[None, None, :].astype(_F32)
        )
        acts = [jax.nn.relu(pre0).reshape(TI * TJ, H).astype(cdt)]
        for l in range(1, L):
            pre = jnp.dot(acts[-1], w_ref[l - 1], preferred_element_type=_F32)
            pre = pre + b_ref[l - 1][None, :].astype(_F32)
            if l == inject:
                pre = pre + qa_ref[0, 0][None, :].astype(_F32)
            acts.append(jax.nn.relu(pre).astype(cdt))
        # --- backward through the chain; d(a_{L-1}) = g for every pair ---
        d = jnp.broadcast_to(g[None, :], (TI * TJ, H))
        if keep < 1.0:  # same mask as the forward (same seed + coords)
            mask = _pair_mask(seed_ref, b_idx, it, jt, TI * TJ, keep)
            d = d * (mask * (1.0 / keep))
        for l in range(L - 1, 0, -1):
            # relu' = (acts > 0); acts = relu(pre) >= 0, so sign(acts) is the
            # mask without an i1 vector (Mosaic relayout of bool tiles fails).
            dpre = (d * jnp.sign(acts[l].astype(_F32))).astype(cdt)
            dw_ref[l - 1] += jax.lax.dot_general(
                acts[l - 1], dpre,
                (((0,), (0,)), ((), ())),
                preferred_element_type=_F32,
            )
            db_ref[l - 1] += jnp.sum(dpre.astype(_F32), axis=0)
            if l == inject:
                dqa_ref[0, 0] += jnp.sum(dpre.astype(_F32), axis=0)
            d = jax.lax.dot_general(
                dpre, w_ref[l - 1],
                (((1,), (1,)), ((), ())),
                preferred_element_type=_F32,
            )
        dpre0 = d * jnp.sign(acts[0].astype(_F32))  # (TI*TJ, H) fp32
        ds_ref[0, 0] += jnp.sum(dpre0, axis=0)
        t = dpre0.reshape(TI, TJ, H)
        du_acc += jnp.sum(t, axis=1)
        dv_ref[0, jt * TJ : (jt + 1) * TJ, :] += jnp.sum(t, axis=0)
    du_ref[0] = du_acc


def _fwd_kernel_int8(
    u_ref, v_ref, s_ref, qa_ref, w8_ref, m_ref, b_ref, out_ref,
    *, L, inject, TI, TJ, nj,
):
    """Int8 inference variant: the g-chain matmuls run on the int8 MXU.

    Static folded quantization (round 2; the round-1 dynamic per-tile
    variant lost 0.64x to bf16 because every layer paid a max-reduce +
    rescale VPU pass over the 2048-row tile). Here ALL scale arithmetic is
    folded outside the kernel: u/v/s/qa/b arrive pre-scaled into each
    layer's int8 domain (activation scales calibrated on an in-jit
    subsample, see _activation_scales), so per-layer quantization is a bare
    min(a+0.5, 127) cast and dequant+requant is the single multiply m_l
    that the int8 matmul needs anyway. relu >= 0, so no negative clip.
    """
    it = pl.program_id(1)

    @pl.when(it == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    u = u_ref[0]
    s = s_ref[0, 0]
    acc = jnp.zeros((out_ref.shape[-1],), _F32)
    for jt in range(nj // TJ):
        vblk = v_ref[0, jt * TJ : (jt + 1) * TJ, :]
        pre0 = (
            u[:, None, :].astype(_F32)
            + vblk[None, :, :].astype(_F32)
            + s[None, None, :].astype(_F32)
        )  # already in layer-0's x127/c0 domain
        a0 = jax.nn.relu(pre0).reshape(TI * TJ, u.shape[-1])
        a8 = jnp.minimum(a0 + 0.5, 127.0).astype(jnp.int8)
        for l in range(1, L):
            acc32 = jax.lax.dot_general(
                a8, w8_ref[l - 1], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
                # pin: a global jax_default_matmul_precision=highest request
                # has no int8 lowering in Mosaic
                precision=jax.lax.Precision.DEFAULT,
            )
            pre = acc32.astype(_F32) * m_ref[l - 1, 0] + b_ref[l - 1][None, :]
            if l == inject:
                pre = pre + qa_ref[0, 0][None, :].astype(_F32)
            a = jax.nn.relu(pre)
            if l < L - 1:
                a8 = jnp.minimum(a + 0.5, 127.0).astype(jnp.int8)
        acc = acc + jnp.sum(a, axis=0)
    out_ref[0, 0] += acc


def _activation_scales(u, v, s, qa, ws, bs, inject: int, margin: float = 1.2):
    """Per-layer activation amax (L-1,) from an in-jit subsample.

    Runs the fp chain on a tiny object subset (<=4 samples x <=16x16 pairs,
    ~0.1% of the batch FLOPs) and takes per-layer maxima; relu amax scales
    near-linearly across pair subsets, and `margin` absorbs the subsample
    underestimate (values beyond it clip at 127, which relu tolerates).

    The subsample is STRIDED across the batch and object axes (not the batch
    head): with sorted/easy leading samples a head subsample underestimates
    the live amax and silently hard-clips the rest of the batch at 127.
    """
    nb = min(u.shape[0], 4)
    no = min(u.shape[1], 16)
    # ceil-strides: floor degrades to head sampling when nb <= B < 2*nb
    # (sb=1 takes samples 0..nb-1 — the exact bias striding exists to avoid)
    sb = -(-u.shape[0] // nb)
    so = -(-u.shape[1] // no)
    sv = -(-v.shape[1] // no)  # v may hold nj != ni objects (sharded case)
    ub = u[::sb][:nb, ::so][:, :no].astype(_F32)
    vb = v[::sb][:nb, ::sv][:, :no].astype(_F32)
    # reshape by the ACTUAL row count: ceil-striding can yield < nb samples
    # (B=5 -> sb=2 -> 3 rows); reshaping by nominal nb mixed samples and
    # broke the qa broadcast (round-3 advisor finding).
    a = jax.nn.relu(
        ub[:, :, None, :]
        + vb[:, None, :, :]
        + s[::sb][:nb, None, None, :].astype(_F32)
    ).reshape(ub.shape[0], -1, u.shape[-1])
    amaxes = [jnp.max(a)]
    L = ws.shape[0] + 1
    for l in range(1, L):
        pre = a @ ws[l - 1].astype(_F32) + bs[l - 1][None, None, :].astype(_F32)
        if l == inject:
            pre = pre + qa[::sb][:nb, None, :].astype(_F32)
        a = jax.nn.relu(pre)
        if l < L - 1:
            amaxes.append(jnp.max(a))
    return jnp.maximum(jnp.stack(amaxes), 1e-6) * margin  # (L-1,)


def int8_clip_fractions(u, v, s, qa, ws, bs, inject: int, margin: float = 1.2):
    """Calibration-drift diagnostic: per-layer fraction of activation values
    that would hard-clip at 127 under the scales `_activation_scales`
    produces for this batch (round-2 advisor finding: clipping past the
    margin was silent). Returns (L-1,) fractions, one per quantization point.

    Evaluates the fp chain on a subsample PHASE-OFFSET from the calibration
    one (same ceil-strides, started half a stride later), so it measures
    exactly the rows the strided calibration never saw, at the same ~0.1%
    FLOP budget. Usage: run host-side on a live batch when int8 accuracy
    drifts; fractions >> 1e-3 mean the 1.2x margin is being exceeded and
    the margin (or per-batch recalibration) needs raising.

    Degenerate case: when B <= 4 AND both object axes are <= 16, every
    stride is 1, the phase offset is 0, and the "probe" subsample IS the
    calibration subsample — which then covered the full input exactly, so
    with margin >= 1 a zero result is the TRUE answer (exact calibration
    cannot clip), not a missed drift. Only partially-strided axes carry
    drift information; sub-margin probes (margin < 1) still report > 0.
    """
    c = _activation_scales(u, v, s, qa, ws, bs, inject, margin=margin)
    nb = min(u.shape[0], 4)
    no = min(u.shape[1], 16)
    sb = -(-u.shape[0] // nb)
    so = -(-u.shape[1] // no)
    sv = -(-v.shape[1] // no)
    ob, oo, ov = sb // 2, so // 2, sv // 2
    ub = u[ob::sb][:nb, oo::so][:, :no].astype(_F32)
    vb = v[ob::sb][:nb, ov::sv][:, :no].astype(_F32)
    sub = s[ob::sb][:nb].astype(_F32)
    qb = qa[ob::sb][:nb].astype(_F32)
    a = jax.nn.relu(ub[:, :, None, :] + vb[:, None, :, :] + sub[:, None, None, :])
    a = a.reshape(a.shape[0], -1, u.shape[-1])
    fracs = [jnp.mean(a > c[0])]
    L = ws.shape[0] + 1
    for l in range(1, L):
        pre = a @ ws[l - 1].astype(_F32) + bs[l - 1][None, None, :].astype(_F32)
        if l == inject:
            pre = pre + qb[:, None, :]
        a = jax.nn.relu(pre)
        if l < L - 1:
            fracs.append(jnp.mean(a > c[l]))
    return jnp.stack(fracs)  # (L-1,)


def _fwd_pallas_int8(u, v, s, qa, ws, bs, inject: int, interpret: bool):
    B, ni, H = u.shape
    nj = v.shape[1]
    L = ws.shape[0] + 1
    TI, TJ = _tiles(ni, nj, H, L)
    # symmetric per-layer weight quantization (host-free, traced)
    sw = jnp.maximum(jnp.max(jnp.abs(ws), axis=(1, 2)), 1e-9)  # (L-1,)
    w8 = jnp.clip(
        jnp.round(ws.astype(_F32) / sw[:, None, None] * 127.0), -127, 127
    ).astype(jnp.int8)
    c = _activation_scales(u, v, s, qa, ws, bs, inject)  # (L-1,)
    # fold every scale outside the kernel:
    #   layer-0 inputs enter in the x(127/c0) domain
    u = (u.astype(_F32) * (127.0 / c[0])).astype(u.dtype)
    v = (v.astype(_F32) * (127.0 / c[0])).astype(v.dtype)
    s = (s.astype(_F32) * (127.0 / c[0])).astype(s.dtype)
    #   dequant(l-1) x requant(l): m_l = c_{l-1} * sw_l / (127 * c_l); the
    #   last layer dequants to REAL values (no requant)
    requant = jnp.concatenate([127.0 / c[1:], jnp.ones((1,))])  # (L-1,)
    m = (c * (sw / 127.0) / 127.0) * requant  # (L-1,)
    #   biases/injection prescaled into each layer's target domain (the same
    #   requant factor: the last layer's bias stays in real values)
    b_f = bs.astype(_F32) * requant[:, None]
    qa_f = qa.astype(_F32)
    if 0 < inject < L:
        qa_f = qa_f * requant[inject - 1]
    kern = functools.partial(
        _fwd_kernel_int8, L=L, inject=inject, TI=TI, TJ=TJ, nj=nj
    )
    out = pl.pallas_call(
        kern,
        grid=(B, ni // TI),
        in_specs=[
            pl.BlockSpec((1, TI, H), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nj, H), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L - 1, H, H), lambda b, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L - 1, 1), lambda b, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((L - 1, H), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, H), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, H), _F32),
        interpret=interpret,
    )(u, v, s[:, None, :], qa_f[:, None, :], w8, m[:, None].astype(_F32), b_f)
    return out[:, 0, :]


def pairwise_core_int8(u, v, s, qa, ws, bs, *, inject: int, interpret: bool = False):
    """Int8 inference path (no VJP). Falls back to the reference off-TPU or on
    kernel-unsupported shapes — LOUDLY (round-3 verdict: an explicit
    ``--rl-impl pallas_int8`` must never silently benchmark fp math)."""
    import warnings

    B, ni, H = u.shape
    L = ws.shape[0] + 1
    on_tpu = jax.default_backend() == "tpu"
    if (on_tpu or interpret) and _supported(ni, v.shape[1], H, L):
        return jax.lax.stop_gradient(
            _fwd_pallas_int8(u, v, s, qa, ws, bs, inject, interpret)
        )
    why = (
        f"shape unsupported by the fused kernel (ni={ni}, nj={v.shape[1]}, "
        f"H={H}, L={L}: needs H%128==0, L>=2 and tileable object counts)"
        if (on_tpu or interpret)
        else f"backend is {jax.default_backend()!r}, not TPU"
    )
    warnings.warn(
        f"pallas_int8 requested but {why}; running the fp32 reference "
        "pairwise path instead — reported numbers are NOT int8",
        stacklevel=2,
    )
    return pairwise_core_reference(u, v, s, qa, ws, bs, inject)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _bwd_vmem_bytes(ti: int, tj: int, H: int, L: int) -> int:
    """Scoped-VMEM stack estimate for one backward grid step.

    Dominant live buffers per j-tile: L activation blocks (rows, H) bf16,
    pre0 + d in fp32, dpre in bf16 -> rows*H*(2L + 10) bytes. Validated
    against the Mosaic compile error at TI=32/TJ=64/H=512/L=4: model says
    18.9 MB, compiler measured 18.72 MB against its 16 MB limit. Block I/O
    (w, dw, v, dv) is accounted by the compiler separately; the stack is
    what OOMs first at large rows*H.
    """
    rows = ti * tj
    return rows * H * (2 * L + 10)


_SCOPED_VMEM_LIMIT = 16 * 1024 * 1024


def _tiles(ni: int, nj: int | None = None, H: int = 256, L: int = 4) -> Tuple[int, int]:
    """(TI, TJ): i-tile and j-tile sizing the TI*TJ pair-row matmuls.

    Measured on v5e: bigger row blocks win (TI=32 at n=64 runs the forward at
    ~0.42 ms vs 0.54 ms for TI=16), but the backward's recompute stack must
    fit the 16 MB scoped-VMEM limit (TI=32 x TJ=64 x H=512 x L=4 OOMed at
    18.7 MB — the wide-fp shape), so rows are capped by _bwd_vmem_bytes with
    10% compile-margin, and by the measured 2048-row tuning point.
    """
    nj = ni if nj is None else nj
    budget = _SCOPED_VMEM_LIMIT * 9 // 10
    row_cap = min(2048, budget // (H * (2 * L + 10)))
    tj = nj if nj <= 128 else 128
    if tj and nj % tj:
        return 0, 0
    ti = 0
    for cand in (32, 16, 8):
        if ni % cand == 0 and cand * tj <= row_cap:
            ti = cand
            break
    if ti == 0 and ni % 8 == 0 and 8 * tj <= row_cap:
        ti = 8
    return ti, tj


def _supported(ni: int, nj: int, H: int, L: int) -> bool:
    ti, tj = _tiles(ni, nj, H, L)
    return bool(ti and tj) and H % 128 == 0 and L >= 2


def _fwd_pallas(u, v, s, qa, ws, bs, seed, inject: int, interpret: bool, keep: float):
    B, ni, H = u.shape
    nj = v.shape[1]
    L = ws.shape[0] + 1
    TI, TJ = _tiles(ni, nj, H, L)
    kern = functools.partial(
        _fwd_kernel, L=L, inject=inject, TI=TI, TJ=TJ, nj=nj, keep=keep
    )
    flops = 2 * B * ni * nj * (L - 1) * H * H + 2 * B * ni * nj * H
    out = pl.pallas_call(
        kern,
        grid=(B, ni // TI),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TI, H), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nj, H), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L - 1, H, H), lambda b, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L - 1, H), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, H), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, H), _F32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=u.size * 2 * u.dtype.itemsize, transcendentals=0
        ),
        interpret=interpret,
    )(seed, u, v, s[:, None, :], qa[:, None, :], ws, bs)
    return out[:, 0, :]


def _bwd_pallas(u, v, s, qa, ws, bs, seed, g, inject: int, interpret: bool, keep: float):
    B, ni, H = u.shape
    nj = v.shape[1]
    L = ws.shape[0] + 1
    TI, TJ = _tiles(ni, nj, H, L)
    kern = functools.partial(
        _bwd_kernel, L=L, inject=inject, TI=TI, TJ=TJ, nj=nj, keep=keep
    )
    out_shape = (
        jax.ShapeDtypeStruct((B, ni, H), _F32),  # du
        jax.ShapeDtypeStruct((B, nj, H), _F32),  # dv
        jax.ShapeDtypeStruct((B, 1, H), _F32),  # ds
        jax.ShapeDtypeStruct((B, 1, H), _F32),  # dqa
        jax.ShapeDtypeStruct((L - 1, H, H), _F32),  # dws
        jax.ShapeDtypeStruct((L - 1, H), _F32),  # dbs
    )
    out_specs = (
        pl.BlockSpec((1, TI, H), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nj, H), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, H), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, H), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((L - 1, H, H), lambda b, i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((L - 1, H), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
    )
    du, dv, ds, dqa, dws, dbs = pl.pallas_call(
        kern,
        grid=(B, ni // TI),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TI, H), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nj, H), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L - 1, H, H), lambda b, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L - 1, H), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(seed, u, v, s[:, None, :], qa[:, None, :], ws, bs, g[:, None, :])
    return du, dv, ds[:, 0, :], dqa[:, 0, :], dws, dbs


@functools.lru_cache(maxsize=None)
def _make_core(inject: int, interpret: bool, keep: float):
    @jax.custom_vjp
    def core(u, v, s, qa, ws, bs, seed):
        return _fwd_pallas(u, v, s, qa, ws, bs, seed, inject, interpret, keep)

    def fwd(u, v, s, qa, ws, bs, seed):
        return core(u, v, s, qa, ws, bs, seed), (u, v, s, qa, ws, bs, seed)

    def bwd(res, gout):
        import numpy as _np

        u, v, s, qa, ws, bs, seed = res
        du, dv, ds, dqa, dws, dbs = _bwd_pallas(
            u, v, s, qa, ws, bs, seed, gout.astype(_F32), inject, interpret, keep
        )
        return (
            du.astype(u.dtype),
            dv.astype(v.dtype),
            ds.astype(s.dtype),
            dqa.astype(qa.dtype),
            dws.astype(ws.dtype),
            dbs.astype(bs.dtype),
            _np.zeros(seed.shape, dtype=jax.dtypes.float0),  # int input
        )

    core.defvjp(fwd, bwd)
    return core


def pairwise_core(
    u, v, s, qa, ws, bs, *,
    inject: int,
    interpret: bool = False,
    pair_keep: float = 1.0,
    seed=None,
):
    """Dispatch: fused Pallas on TPU (or interpret mode), jnp elsewhere.

    pair_keep < 1 enables in-kernel inverted pair dropout; `seed` must then be
    a (1, 1) int32 array (fresh per step).
    """
    B, ni, H = u.shape
    nj = v.shape[1]
    L = ws.shape[0] + 1
    on_tpu = jax.default_backend() == "tpu"
    if pair_keep < 1.0 and not on_tpu:
        # pltpu.prng_* has no CPU/interpret lowering
        raise NotImplementedError(
            "in-kernel pair dropout runs on TPU only; use the xla impl's "
            "pair dropout elsewhere"
        )
    if (on_tpu or interpret) and _supported(ni, nj, H, L):
        if seed is None:
            seed = jnp.zeros((1, 1), jnp.int32)
        return _make_core(inject, interpret, float(pair_keep))(
            u, v, s, qa, ws, bs, seed
        )
    if pair_keep < 1.0:
        raise NotImplementedError(
            "in-kernel pair dropout needs a pallas-supported shape "
            f"(ni={ni}, nj={nj}, H={H}, L={L}); use the xla impl's pair "
            "dropout instead"
        )
    return pairwise_core_reference(u, v, s, qa, ws, bs, inject)


def pairwise_core_sharded(
    u, v, s, qa, ws, bs, *,
    inject: int,
    mesh,
    interpret: bool = False,
    pair_keep: float = 1.0,
    seed=None,
    int8: bool = False,
):
    """shard_map island: run the fused kernel per shard under a mesh.

    Pallas calls are opaque to GSPMD, so under a multi-device mesh the kernel
    is mapped explicitly: the batch splits over 'data'; if the mesh has a
    'pairs' axis, the i-object rows of u split over it (each shard computes
    its ni/k x nj pair block) and the pooled sums psum over 'pairs' — the
    ring-reduce rides ICI (SURVEY.md section 5 "long-context" analogue).
    Autodiff of shard_map handles the collective transposes (dv contributions
    psum back; replicated ws/bs cotangents sum over shards).

    int8=True maps the inference-only int8 kernel instead (round 4): each
    shard calibrates activation scales on its local rows and the fp32 pooled
    partial sums psum over 'pairs' exactly as in the bf16 island.
    """
    from jax.sharding import PartitionSpec as P

    if int8 and pair_keep < 1.0:
        raise ValueError("int8 is inference-only; pair dropout cannot be active")
    if mesh is None or mesh.devices.size == 1:
        if int8:
            return pairwise_core_int8(
                u, v, s, qa, ws, bs, inject=inject, interpret=interpret
            )
        return pairwise_core(
            u, v, s, qa, ws, bs,
            inject=inject, interpret=interpret, pair_keep=pair_keep, seed=seed,
        )
    has_pairs = "pairs" in mesh.axis_names and mesh.shape["pairs"] > 1
    data_axes = tuple(a for a in mesh.axis_names if a != "pairs")
    if seed is None:
        seed = jnp.zeros((1, 1), jnp.int32)

    def f(u_l, v_l, s_l, qa_l, ws_l, bs_l, seed_l):
        if pair_keep < 1.0:
            # decorrelate dropout masks across shards: the replicated seed is
            # offset by a per-shard id (local grid coords repeat per shard).
            shard_id = jnp.int32(0)
            stride = 1
            for ax in mesh.axis_names:
                shard_id = shard_id + jax.lax.axis_index(ax) * stride
                stride *= mesh.shape[ax]
            seed_l = seed_l + shard_id * jnp.int32(1_000_003)
        if int8:
            out = pairwise_core_int8(
                u_l, v_l, s_l, qa_l, ws_l, bs_l,
                inject=inject, interpret=interpret,
            )
        else:
            out = pairwise_core(
                u_l, v_l, s_l, qa_l, ws_l, bs_l,
                inject=inject, interpret=interpret, pair_keep=pair_keep, seed=seed_l,
            )
        if has_pairs:
            out = jax.lax.psum(out, "pairs")
        return out

    u_spec = P(data_axes, "pairs" if has_pairs else None, None)
    return jax.shard_map(
        f,
        mesh=mesh,
        in_specs=(
            u_spec,
            P(data_axes, None, None),
            P(data_axes, None),
            P(data_axes, None),
            P(),
            P(),
            P(None, None),
        ),
        out_specs=P(data_axes, None),
        # pallas_call out_shapes carry no vma info; replication is enforced
        # structurally (psum over 'pairs' above).
        check_vma=False,
    )(u, v, s, qa, ws, bs, seed)


# ---------------------------------------------------------------------------
# High-level entry: full g_theta pooled sum from objects + question
# ---------------------------------------------------------------------------


def _project_pair_inputs(x, q, gw, gb, inject: int, dtype):
    """Thin per-object/per-sample projections feeding the pairwise core.

    Factors the concat-into-linear layer 0 (and a deep injection layer) into
    u = x@W0[:c], v = x@W0[c:2c], per-sample shift s and injection term qa,
    plus the stacked uniform-width chain (ws, bs) — the exact inputs both the
    fused kernels and the jnp reference core consume.
    """
    B, n, c = x.shape
    H = gw[0].shape[-1]
    dt = jnp.dtype(dtype)
    x = x.astype(dt)
    q = q.astype(dt)
    w0 = gw[0].astype(dt)
    u = x @ w0[:c]
    v = x @ w0[c : 2 * c]
    s = jnp.broadcast_to(gb[0].astype(dt)[None, :], (B, H))
    if inject == 0:
        s = s + q @ w0[2 * c :]
        qa = jnp.zeros((B, H), dt)
        ws = jnp.stack([gw[l].astype(dt) for l in range(1, len(gw))])
        bs = jnp.stack([gb[l].astype(dt) for l in range(1, len(gw))])
    else:
        h_prev = gw[inject].shape[0] - q.shape[-1]
        qa = q @ gw[inject][h_prev:].astype(dt)
        ws_list, bs_list = [], []
        for l in range(1, len(gw)):
            wl = gw[l].astype(dt)
            ws_list.append(wl[:h_prev] if l == inject else wl)
            bs_list.append(gb[l].astype(dt))
        ws = jnp.stack(ws_list)
        bs = jnp.stack(bs_list)
    return u, v, s, qa, ws, bs


def pairwise_clip_fractions(
    x, q, gw, gb, *, inject: int, dtype=jnp.bfloat16, margin: float = 1.2
):
    """Int8 calibration-drift report from objects + question (see
    int8_clip_fractions): per-layer fraction of probe activations that would
    hard-clip at 127 under this batch's calibrated scales. The int8 eval path
    (test.py --rl-impl pallas_int8) prints this on a live batch."""
    u, v, s, qa, ws, bs = _project_pair_inputs(x, q, gw, gb, inject, dtype)
    return int8_clip_fractions(u, v, s, qa, ws, bs, inject, margin=margin)


def fused_pairwise_g(
    x: jnp.ndarray,  # (B, n, c) objects
    q: jnp.ndarray,  # (B, h) question encoding
    gw: Sequence[jnp.ndarray],  # g layer kernels (layer 0: (2c[+h], H))
    gb: Sequence[jnp.ndarray],
    *,
    inject: int,
    dtype=jnp.bfloat16,
    interpret: bool = False,
    mesh=None,
    pair_keep: float = 1.0,
    seed=None,
    int8: bool = False,
) -> jnp.ndarray:
    """Pooled g_theta over all object pairs; (B, g_out) fp32.

    The thin projections are plain JAX (autodiff handles their grads); the
    n^2-heavy chain runs in the fused kernel via pairwise_core (under a
    multi-device mesh: pairwise_core_sharded).
    """
    if int8 and pair_keep < 1.0:
        # same guard the sharded path applies (pairwise_core_sharded) — the
        # single-device int8 kernel has no dropout support either, and
        # silently ignoring pair_keep would change documented semantics
        raise ValueError("int8 is inference-only; pair dropout cannot be active")
    u, v, s, qa, ws, bs = _project_pair_inputs(x, q, gw, gb, inject, dtype)
    if int8 and mesh is None:
        return pairwise_core_int8(u, v, s, qa, ws, bs, inject=inject, interpret=interpret)
    if mesh is not None:
        return pairwise_core_sharded(
            u, v, s, qa, ws, bs,
            inject=inject, mesh=mesh, interpret=interpret,
            pair_keep=pair_keep, seed=seed, int8=int8,
        )
    return pairwise_core(
        u, v, s, qa, ws, bs,
        inject=inject, interpret=interpret, pair_keep=pair_keep, seed=seed,
    )
