"""Multi-device tests on the 8-device virtual CPU mesh (SURVEY.md 4.5).

Covers: GSPMD data-parallel train step equivalence, the shard_map kernel
island (data + pairs axes) forward/backward, and the driver's
dryrun_multichip entry.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnet.kernels.pairwise import (
    pairwise_core_reference,
    pairwise_core_sharded,
)
from rnet.parallel import mesh as pmesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def test_make_mesh_specs():
    m = pmesh.make_mesh(None)
    assert m.axis_names == ("data",) and m.devices.size == len(jax.devices())
    m2 = pmesh.make_mesh("data:4,pairs:2")
    assert m2.shape == {"data": 4, "pairs": 2}
    with pytest.raises(ValueError):
        pmesh.make_mesh("data:3")


def _core_inputs(B=8, n=16, H=128, L=3, key=0):
    ks = jax.random.split(jax.random.key(key), 6)
    return (
        jax.random.normal(ks[0], (B, n, H)) * 0.3,
        jax.random.normal(ks[1], (B, n, H)) * 0.3,
        jax.random.normal(ks[2], (B, H)) * 0.1,
        jax.random.normal(ks[3], (B, H)) * 0.1,
        jax.random.normal(ks[4], (L - 1, H, H)) / np.sqrt(H),
        jax.random.normal(ks[5], (L - 1, H)) * 0.05,
    )


@pytest.mark.parametrize("spec", ["data:8", "data:4,pairs:2", "data:2,pairs:4"])
def test_sharded_kernel_island_forward(spec):
    mesh = pmesh.make_mesh(spec)
    args = _core_inputs()
    ref = pairwise_core_reference(*args, inject=0)
    out = jax.jit(
        lambda *a: pairwise_core_sharded(*a, inject=0, mesh=mesh, interpret=True)
    )(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("spec", ["data:8", "data:4,pairs:2"])
def test_sharded_kernel_island_int8_forward(spec):
    """Round 4: the int8 inference kernel has a shard_map island too — each
    shard calibrates on its local rows; pooled partials psum over 'pairs'.
    Tolerance matches the single-device int8 quantization-error bound."""
    mesh = pmesh.make_mesh(spec)
    args = _core_inputs()
    ref = pairwise_core_reference(*args, inject=0)
    out = jax.jit(
        lambda *a: pairwise_core_sharded(
            *a, inject=0, mesh=mesh, interpret=True, int8=True
        )
    )(*args)
    rel = float(
        np.abs(np.asarray(out) - np.asarray(ref)).max()
        / (np.abs(np.asarray(ref)).max() + 1e-9)
    )
    assert rel < 0.03, rel


def test_sharded_kernel_island_grads():
    mesh = pmesh.make_mesh("data:4,pairs:2")
    args = _core_inputs()
    r = jax.random.normal(jax.random.key(7), (8, 128))

    def loss_ref(*a):
        return (pairwise_core_reference(*a, inject=0) * r).sum()

    def loss_sh(*a):
        return (
            pairwise_core_sharded(*a, inject=0, mesh=mesh, interpret=True) * r
        ).sum()

    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    g_sh = jax.jit(jax.grad(loss_sh, argnums=tuple(range(6))))(*args)
    for name, a, b in zip(["du", "dv", "ds", "dqa", "dws", "dbs"], g_ref, g_sh):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-2, err_msg=name
        )


def test_gspmd_dp_train_step_matches_single_device(fixture_dir, dicts, tmp_path):
    """One SGD step on data:8 == the same step on one device (xla impl)."""
    from rnet.config import load_config
    from rnet.data.clevr import ClevrDatasetStateDescription
    from rnet.data.pipeline import BatchIterator
    from rnet.models import RN
    from rnet.train.loop import make_injected_optimizer
    from rnet.train.steps import create_train_state, make_jitted_steps

    cfg = (
        load_config("original-sd", overrides={"compute_dtype": "float32", "rl_impl": "xla"})
        .replace(g_layers=(64, 64), f_layers=(32,), lstm_hidden=32,
                 lstm_word_emb=8, dropout=0.0, n_answers=dicts.n_answers)
    )
    ds = ClevrDatasetStateDescription(fixture_dir, "train", dicts)
    batch = jax.tree.map(
        jnp.asarray, next(iter(BatchIterator(ds, 16, shuffle=False, invert=True)))
    )
    model = RN(cfg=cfg, vocab_size=dicts.vocab_size)
    opt = make_injected_optimizer(1e-3, clip_norm=50.0)
    state0 = create_train_state(model, cfg, opt, jax.random.key(0), batch)
    jit_train, _ = make_jitted_steps(model, cfg, opt, donate=False)

    # single device
    s1, m1 = jit_train(state0, batch)
    # 8-way data parallel
    mesh = pmesh.make_mesh("data:8")
    state_r = pmesh.replicate_state(state0, mesh)
    with mesh, pmesh.pair_sharding(mesh):
        s8, m8 = jit_train(state_r, pmesh.shard_batch(batch, mesh))
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        jax.tree.map(np.asarray, s8.params),
        jax.tree.map(np.asarray, s1.params),
    )


@pytest.mark.slow
def test_dryrun_multichip():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "_graft", os.path.join(os.path.dirname(os.path.dirname(__file__)), "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_graft_entry_compiles():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "_graft2", os.path.join(os.path.dirname(os.path.dirname(__file__)), "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, example_args = mod.entry()
    out = jax.jit(fn)(*example_args)
    assert out.shape[-1] == 28


def test_put_global_chunked_matches_put_global():
    """Chunked cache upload (round 5): slab-wise device_put + compiled
    concatenate must produce the same replicated global array as one
    put_global, and must beat the watchdog clock between slabs so a
    multi-GB upload cannot trip --stall-timeout (results/v3_probe30k_r5:
    a healthy 1.87 GB upload was killed and restart-looped by a 900s
    watchdog before this path existed)."""
    mesh = pmesh.make_mesh("data:8")
    sh = pmesh.replicated(mesh)
    x = np.arange(13 * 5 * 7, dtype=np.uint8).reshape(13, 5, 7)
    beats = []
    out = pmesh.put_global_chunked(
        x, sh, beat=lambda: beats.append(1), slab_bytes=3 * 5 * 7
    )
    assert out.sharding == sh
    np.testing.assert_array_equal(np.asarray(out), x)
    # ceil(13/3)=5 slab beats + 1 post-concat beat
    assert len(beats) == 6
    # small arrays fall through to the single put (one courtesy beat)
    beats.clear()
    out2 = pmesh.put_global_chunked(x, sh, beat=lambda: beats.append(1))
    np.testing.assert_array_equal(np.asarray(out2), x)
    assert len(beats) == 1
