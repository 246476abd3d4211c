"""Fused Pallas pairwise kernel vs the jnp reference (SURVEY.md section 4.3).

Runs in interpreter mode on CPU; the same kernel compiles on TPU (covered by
bench.py and the TPU smoke script). Checks forward AND the custom VJP across
grid sizes (8x8 -> n=64, 16x16 -> n=256) and injection positions.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnet.kernels.pairwise import (
    _tiles,
    fused_pairwise_g,
    pairwise_core,
    pairwise_core_reference,
)


def _inputs(B, n, H, L, inject, key=0):
    ks = jax.random.split(jax.random.key(key), 6)
    u = jax.random.normal(ks[0], (B, n, H)) * 0.3
    v = jax.random.normal(ks[1], (B, n, H)) * 0.3
    s = jax.random.normal(ks[2], (B, H)) * 0.1
    qa = jax.random.normal(ks[3], (B, H)) * 0.1
    ws = jax.random.normal(ks[4], (L - 1, H, H)) * (1.0 / np.sqrt(H))
    bs = jax.random.normal(ks[5], (L - 1, H)) * 0.05
    return u, v, s, qa, ws, bs


def test_tile_selection():
    assert _tiles(64) == (32, 64)  # 2048 rows per block
    ti, tj = _tiles(256)
    assert 256 % ti == 0 and tj == 128 and ti * tj <= 2048
    assert _tiles(12)[0] == 0 or 12 % _tiles(12)[0] == 0


def test_every_config_fits_scoped_vmem():
    """The backward's stack must fit the 16 MB scoped-VMEM limit for every
    named config's pairwise shape (the wide-fp OOM class, round 3)."""
    import json

    from rnet.config import load_config
    from rnet.kernels.pairwise import _SCOPED_VMEM_LIMIT, _bwd_vmem_bytes

    names = json.load(open("config.json")).keys()
    for name in names:
        cfg = load_config(name)
        n, H, L = cfg.n_objects, cfg.g_layers[0], len(cfg.g_layers)
        ti, tj = _tiles(n, n, H)
        if not (ti and tj):
            continue  # shape takes the XLA path, no kernel VMEM at stake
        est = _bwd_vmem_bytes(ti, tj, H, L)
        assert est <= _SCOPED_VMEM_LIMIT, (
            f"{name}: TI={ti} TJ={tj} H={H} L={L} -> {est/2**20:.1f} MB "
            f"backward stack exceeds the 16 MB scoped-VMEM limit"
        )


def test_vmem_model_matches_observed_oom():
    """Pin the estimator to the compile error that motivated it."""
    from rnet.kernels.pairwise import _bwd_vmem_bytes

    est = _bwd_vmem_bytes(32, 64, 512, 4)
    assert 17.5 * 2**20 < est < 20 * 2**20  # compiler measured 18.72 MB


def test_tile_selection_vmem_aware():
    """Row cap halves at H=512: TI=32 x TJ=64 x H=512 OOMed the 16 MB scoped
    vmem in the backward (wide-fp shape, round 3)."""
    assert _tiles(64, 64, 512) == (16, 64)  # 1024 rows per block
    assert _tiles(64, 64, 256) == (32, 64)  # tuned point unchanged
    assert _tiles(64, 64, 128) == (32, 64)  # small H unchanged (cap 2048)
    ti, tj = _tiles(1024, 1024, 256)  # stretch-32 shape unchanged
    assert (ti, tj) == (16, 128)


def test_kernel_h512_matches_reference():
    """wide-fp head shape (H=512) through the halved row cap, fwd + bwd."""
    B, n, H, L, inject = 1, 32, 512, 4, 0
    args = _inputs(B, n, H, L, inject)
    ref = pairwise_core_reference(*args, inject=inject)
    out = pairwise_core(*args, inject=inject, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=5e-3)

    def loss_k(ws, u):
        return pairwise_core(u, *args[1:4], ws, args[5], inject=inject, interpret=True).sum()

    def loss_r(ws, u):
        return pairwise_core_reference(u, *args[1:4], ws, args[5], inject=inject).sum()

    gk = jax.grad(loss_k, argnums=(0, 1))(args[4], args[0])
    gr = jax.grad(loss_r, argnums=(0, 1))(args[4], args[0])
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-3)


@pytest.mark.parametrize("n", [16, 64])
@pytest.mark.parametrize("inject", [0, 2])
def test_kernel_forward_matches_reference(n, inject):
    B, H, L = 2, 128, 4
    args = _inputs(B, n, H, L, inject)
    ref = pairwise_core_reference(*args, inject=inject)
    out = pairwise_core(*args, inject=inject, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-3)


def test_kernel_forward_256_objects():
    """16x16 grid (65536 pairs) — the BASELINE stretch config."""
    B, H, L, inject = 1, 128, 3, 0
    args = _inputs(B, 256, H, L, inject)
    ref = pairwise_core_reference(*args, inject=inject)
    out = pairwise_core(*args, inject=inject, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=5e-3)


@pytest.mark.parametrize("inject", [0, 2])
def test_kernel_vjp_matches_reference(inject):
    B, n, H, L = 2, 16, 128, 3
    args = _inputs(B, n, H, L, inject)
    r = jax.random.normal(jax.random.key(9), (B, H))

    def loss_ref(*a):
        return (pairwise_core_reference(*a, inject=inject) * r).sum()

    def loss_ker(*a):
        return (pairwise_core(*a, inject=inject, interpret=True) * r).sum()

    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    g_ker = jax.grad(loss_ker, argnums=tuple(range(6)))(*args)
    names = ["du", "dv", "ds", "dqa", "dws", "dbs"]
    for name, a, b in zip(names, g_ref, g_ker):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-3, err_msg=name
        )


@pytest.mark.parametrize("inject", [0, 1])
def test_fused_g_end_to_end_grads(inject):
    """fused_pairwise_g (incl. thin projections) vs naive concat math."""
    B, n, c, h, H, L = 2, 16, 10, 12, 128, 3
    from rnet.models.relational import g_input_dims

    dims = g_input_dims(c, h, (H,) * L, inject)
    ks = jax.random.split(jax.random.key(3), 2 * L + 2)
    gw = [
        jax.random.normal(ks[l], (dims[l], H)) / np.sqrt(dims[l])
        for l in range(L)
    ]
    gb = [jax.random.normal(ks[L + l], (H,)) * 0.05 for l in range(L)]
    x = jax.random.normal(ks[-2], (B, n, c))
    q = jax.random.normal(ks[-1], (B, h))
    r = jax.random.normal(jax.random.key(8), (B, H))

    def naive(x, q, gw, gb):
        xi = jnp.broadcast_to(x[:, :, None, :], (B, n, n, c))
        xj = jnp.broadcast_to(x[:, None, :, :], (B, n, n, c))
        a = jnp.concatenate([xi, xj], -1).reshape(B, n * n, 2 * c)
        for l in range(L):
            if l == inject:
                qb = jnp.broadcast_to(q[:, None, :], (B, n * n, h))
                a = jnp.concatenate([a, qb], -1)
            a = jax.nn.relu(a @ gw[l] + gb[l])
        return (a.sum(1) * r).sum()

    def fused(x, q, gw, gb):
        out = fused_pairwise_g(
            x, q, gw, gb, inject=inject, dtype=jnp.float32, interpret=True
        )
        return (out * r).sum()

    val_n, grads_n = jax.value_and_grad(naive, argnums=(0, 1, 2, 3))(x, q, gw, gb)
    val_f, grads_f = jax.value_and_grad(fused, argnums=(0, 1, 2, 3))(x, q, gw, gb)
    np.testing.assert_allclose(float(val_f), float(val_n), rtol=1e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-3
        ),
        grads_f,
        grads_n,
    )


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="in-kernel PRNG needs real TPU"
)
def test_pair_dropout_in_kernel_tpu():
    """Dump the kernel's mask, rebuild the masked sum in jnp, compare fwd+VJP."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from rnet.kernels.pairwise import _pair_mask

    B, n, H, L = 2, 16, 128, 3
    TI, TJ = _tiles(n, n)

    def mask_kernel(seed_ref, out_ref):
        b = pl.program_id(0)
        it = pl.program_id(1)
        for jt in range(n // TJ):
            m = _pair_mask(seed_ref, b, it, jt, TI * TJ, 0.5)
            out_ref[0, :, jt * TJ : (jt + 1) * TJ] = m.reshape(TI, TJ)

    seed = jnp.array([[7]], jnp.int32)
    mask = pl.pallas_call(
        mask_kernel,
        grid=(B, n // TI),
        in_specs=[pl.BlockSpec((1, 1), lambda b, i: (0, 0), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, TI, n), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n, n), jnp.float32),
    )(seed)
    assert 0.4 < float(mask.mean()) < 0.6  # ~keep fraction

    args = _inputs(B, n, H, L, inject=0)
    mj = mask.reshape(B, n * n, 1)

    def ref_masked(u, v, s, qa, ws, bs):
        a = jax.nn.relu(
            u[:, :, None, :] + v[:, None, :, :] + s[:, None, None, :]
        ).reshape(B, n * n, H)
        for l in range(1, L):
            a = jax.nn.relu(a @ ws[l - 1] + bs[l - 1][None, None, :])
        return (a * mj * 2.0).sum(1)

    o_k = pairwise_core(*args, inject=0, pair_keep=0.5, seed=seed)
    o_r = ref_masked(*args)
    np.testing.assert_allclose(np.asarray(o_k), np.asarray(o_r), rtol=1e-5)

    r = jax.random.normal(jax.random.key(9), (B, H))
    gk = jax.grad(
        lambda u: (pairwise_core(u, *args[1:], inject=0, pair_keep=0.5, seed=seed) * r).sum()
    )(args[0])
    gr = jax.grad(lambda u: (ref_masked(u, *args[1:]) * r).sum())(args[0])
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), rtol=1e-4, atol=1e-5)


def test_activation_scales_irregular_batch():
    """B=5/6/9 regression: ceil-striding can yield fewer than the nominal 4
    calibration rows; the reshape must follow the actual row count, not mix
    samples (round-3 advisor finding)."""
    from rnet.kernels.pairwise import _activation_scales

    for B in (5, 6, 9):
        args = _inputs(B, 24, 128, 3, inject=2, key=B)
        sc = _activation_scales(*args, inject=2)
        sc = np.asarray(sc)
        assert sc.shape == (2,)
        assert np.all(np.isfinite(sc)) and np.all(sc > 0)


def test_activation_scales_exact_when_fully_sampled():
    """B<=4 and n<=16: every stride is 1, the subsample IS the full input,
    so the calibrated scales equal margin * the true per-layer amax."""
    from rnet.kernels.pairwise import _activation_scales

    B, n, H, L, inject = 3, 16, 128, 3, 2
    u, v, s, qa, ws, bs = _inputs(B, n, H, L, inject)
    sc = np.asarray(_activation_scales(u, v, s, qa, ws, bs, inject, margin=1.0))
    a = jax.nn.relu(
        u[:, :, None, :] + v[:, None, :, :] + s[:, None, None, :]
    ).reshape(B, -1, H)
    true = [jnp.max(a)]
    for l in range(1, L):
        pre = a @ ws[l - 1] + bs[l - 1][None, None, :]
        if l == inject:
            pre = pre + qa[:, None, :]
        a = jax.nn.relu(pre)
        if l < L - 1:
            true.append(jnp.max(a))
    np.testing.assert_allclose(sc, np.asarray(jnp.stack(true)), rtol=1e-6)


def test_int8_clip_fractions_behavior():
    """The calibration-drift diagnostic: zero under a huge margin, positive
    under a sub-unity margin, and well-formed on rectangular / irregular
    shapes (round-3 advisor: previously dead + untested)."""
    from rnet.kernels.pairwise import int8_clip_fractions

    args = _inputs(8, 64, 128, 3, inject=2, key=1)
    hi = np.asarray(int8_clip_fractions(*args, inject=2, margin=100.0))
    assert hi.shape == (2,) and np.all(hi == 0.0)
    lo = np.asarray(int8_clip_fractions(*args, inject=2, margin=1e-3))
    assert float(lo.max()) > 0.0
    # rectangular ni != nj (pair-axis-sharded case)
    u, v, s, qa, ws, bs = _inputs(8, 64, 128, 3, inject=0, key=2)
    fr = np.asarray(int8_clip_fractions(u, v[:, :32], s, qa, ws, bs, inject=0))
    assert fr.shape == (2,) and np.all(np.isfinite(fr))
    # irregular batch through the diagnostic too (B=5 regression)
    args5 = _inputs(5, 24, 128, 3, inject=2, key=3)
    fr5 = np.asarray(int8_clip_fractions(*args5, inject=2))
    assert fr5.shape == (2,) and np.all(np.isfinite(fr5))


def test_int8_unsupported_shape_falls_back_loudly():
    """An explicit int8 request on a kernel-unsupported shape must warn and
    return the fp reference result, never silently claim int8 (round-3
    verdict weak #2). n=12 is untileable on every backend."""
    from rnet.kernels.pairwise import pairwise_core_int8

    args = _inputs(2, 12, 128, 3, inject=0)
    with pytest.warns(UserWarning, match="NOT int8"):
        out = pairwise_core_int8(*args, inject=0)
    ref = pairwise_core_reference(*args, inject=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_int8_with_pair_dropout_raises_on_single_device_too():
    """int8+pair_keep<1 raises identically with and without a mesh — the
    single-device path used to silently drop the dropout instead."""
    x = jax.random.normal(jax.random.key(0), (2, 8, 4))
    q = jax.random.normal(jax.random.key(1), (2, 6))
    gw = [jnp.zeros((14, 32)), jnp.zeros((32, 32))]
    gb = [jnp.zeros(32), jnp.zeros(32)]
    with pytest.raises(ValueError, match="inference-only"):
        fused_pairwise_g(
            x, q, gw, gb, inject=0, int8=True, pair_keep=0.5, seed=jnp.uint32(0)
        )


def test_int8_train_request_warns():
    """rl_impl='pallas_int8' during training runs the bf16 kernel — loudly."""
    from rnet.models.relational import RelationalLayer

    layer = RelationalLayer(
        obj_dim=8, q_dim=12, g_layers=(128,) * 3, f_layers=(64,), n_answers=5,
        question_injection_position=0, dropout=0.0, impl="pallas_int8",
        dtype=jnp.float32,
    )
    x = jax.random.normal(jax.random.key(0), (4, 16, 8))
    q = jax.random.normal(jax.random.key(1), (4, 12))
    variables = layer.init(jax.random.key(2), x, q, train=False)
    with pytest.warns(UserWarning, match="inference-only"):
        layer.apply(variables, x, q, train=True)


def test_relational_int8_clip_report_method():
    """The drift diagnostic reaches the layer API (test.py prints it under
    --rl-impl pallas_int8); irregular B=5, n=12 exercised end to end."""
    from rnet.models.relational import RelationalLayer

    layer = RelationalLayer(
        obj_dim=8, q_dim=12, g_layers=(128,) * 3, f_layers=(64,), n_answers=5,
        question_injection_position=2, dropout=0.0, dtype=jnp.float32,
    )
    x = jax.random.normal(jax.random.key(0), (5, 12, 8))
    q = jax.random.normal(jax.random.key(1), (5, 12))
    variables = layer.init(jax.random.key(2), x, q, train=False)
    fr = np.asarray(
        layer.apply(variables, x, q, method=RelationalLayer.int8_clip_report)
    )
    assert fr.shape == (2,) and np.all(np.isfinite(fr))


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="int8 MXU path needs real TPU"
)
def test_int8_inference_path_tpu():
    from rnet.kernels.pairwise import pairwise_core_int8

    B, n, H, L = 8, 64, 256, 4
    args = _inputs(B, n, H, L, inject=0)
    ref = pairwise_core_reference(*args, inject=0)
    o8 = pairwise_core_int8(*args, inject=0)
    rel = float(jnp.abs(o8 - ref).max() / (jnp.abs(ref).max() + 1e-9))
    assert rel < 0.03, rel  # symmetric per-tensor int8 quantization error
