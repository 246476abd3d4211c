"""Model-layer tests: shapes, impl equivalence, injection semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnet.config import ModelConfig, load_config
from rnet.models import RN
from rnet.models.conv import ConvInputModel
from rnet.models.relational import RelationalLayer, g_input_dims
from rnet.models.rn import grid_coords
from rnet.models.text import QuestionEmbedModel

V = 50  # test vocab size


def test_config_grid_math():
    cfg = load_config("original-fp")
    assert cfg.grid == 8 and cfg.n_objects == 64 and cfg.obj_feat_dim == 26
    cfg16 = load_config("stretch-fp-16")
    assert cfg16.grid == 16 and cfg16.n_objects == 256
    cfg32 = load_config("stretch-fp-32")
    assert cfg32.grid == 32 and cfg32.n_objects == 1024  # 1,048,576 pairs
    wide = load_config("wide-fp")
    assert wide.g_layers == (512,) * 4 and wide.n_objects == 64
    sd = load_config("original-sd")
    assert sd.n_objects == 12 and sd.obj_feat_dim == 18


def test_conv_shapes():
    m = ConvInputModel(dtype=jnp.float32)
    x = jnp.ones((2, 128, 128, 3))
    params = m.init(jax.random.key(0), x, train=False)
    y = m.apply(params, x, train=False)
    assert y.shape == (2, 8, 8, 24)
    # train mode updates batch_stats
    y2, updates = m.apply(
        params, x, train=True, mutable=["batch_stats"]
    )
    assert y2.shape == (2, 8, 8, 24)
    assert "batch_stats" in updates


def test_lstm_masking_invariance():
    """Final hidden state must not depend on the amount of padding."""
    m = QuestionEmbedModel(vocab_size=V, emb_dim=8, hidden=16)
    t_short = jnp.array([[3, 5, 7, 0, 0, 0]], dtype=jnp.int32)
    t_long = jnp.array([[3, 5, 7] + [0] * 13], dtype=jnp.int32)
    params = m.init(jax.random.key(0), t_short)
    h1 = m.apply(params, t_short)
    h2 = m.apply(params, t_long)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2[:, :]), atol=1e-6)
    # inverted (pads first) gives the reversed-sequence encoding, also
    # independent of pad count
    t_inv1 = jnp.array([[0, 0, 0, 7, 5, 3]], dtype=jnp.int32)
    t_inv2 = jnp.array([[0] * 13 + [7, 5, 3]], dtype=jnp.int32)
    np.testing.assert_allclose(
        np.asarray(m.apply(params, t_inv1)),
        np.asarray(m.apply(params, t_inv2)),
        atol=1e-6,
    )


def test_lstm_pad_drift_mode():
    """mask_pads=False = reference behavior: identical on pad-free input,
    pad-length-DEPENDENT when pads are present (the documented deviation)."""
    masked = QuestionEmbedModel(vocab_size=V, emb_dim=8, hidden=16)
    drift = QuestionEmbedModel(
        vocab_size=V, emb_dim=8, hidden=16, mask_pads=False
    )
    full = jnp.array([[3, 5, 7, 2, 9, 4]], dtype=jnp.int32)  # no pads
    params = masked.init(jax.random.key(0), full)
    np.testing.assert_allclose(
        np.asarray(masked.apply(params, full)),
        np.asarray(drift.apply(params, full)),
        atol=1e-6,
    )
    # inverted layout (pads first, as the reference's collate produces):
    # the drift encoder's output depends on HOW MANY pads precede the
    # tokens — the gate biases walk the state before the real tokens land.
    t_inv1 = jnp.array([[0, 0, 0, 7, 5, 3]], dtype=jnp.int32)
    t_inv2 = jnp.array([[0] * 13 + [7, 5, 3]], dtype=jnp.int32)
    d1 = np.asarray(drift.apply(params, t_inv1))
    d2 = np.asarray(drift.apply(params, t_inv2[:, -6:]))  # same 3-pad prefix
    np.testing.assert_allclose(
        d1, d2, atol=1e-6
    )  # equal pad count -> equal encoding (deterministic drift)
    d_long = np.asarray(drift.apply(params, t_inv2))
    assert np.abs(d1 - d_long).max() > 1e-4  # more pads -> different state
    # config plumbing: the knob survives load_config overrides
    cfg = load_config("original-fp", overrides={"lstm_mask_pads": False})
    assert cfg.lstm_mask_pads is False


def test_g_input_dims_injection():
    assert g_input_dims(26, 128, (256,) * 4, 0) == [52 + 128, 256, 256, 256]
    assert g_input_dims(26, 128, (256,) * 4, 2) == [52, 256, 256 + 128, 256]


@pytest.mark.parametrize("inject", [0, 2])
def test_relational_naive_vs_xla(inject):
    """The decomposed XLA path must match literal pair materialization."""
    B, n, c, h = 3, 10, 18, 32
    kw = dict(
        obj_dim=c,
        q_dim=h,
        g_layers=(64, 64, 64, 64),
        f_layers=(64, 64),
        n_answers=28,
        question_injection_position=inject,
        dropout=0.0,
        dtype=jnp.float32,
    )
    x = jax.random.normal(jax.random.key(1), (B, n, c))
    q = jax.random.normal(jax.random.key(2), (B, h))
    m_naive = RelationalLayer(impl="naive", **kw)
    m_xla = RelationalLayer(impl="xla", **kw)
    params = m_naive.init(jax.random.key(0), x, q)
    out_naive = m_naive.apply(params, x, q)
    out_xla = m_xla.apply(params, x, q)
    # TPU fp32 matmuls accumulate in a different order than CPU; log-softmax
    # amplifies the last-ulp differences.
    tol = 1e-4 if jax.default_backend() == "cpu" else 2e-3
    np.testing.assert_allclose(
        np.asarray(out_naive), np.asarray(out_xla), rtol=tol, atol=tol
    )
    assert out_naive.shape == (B, 28)
    # log-softmax outputs (TPU exp is a VPU approximation: ~7e-5 deviation)
    np.testing.assert_allclose(
        np.exp(np.asarray(out_xla)).sum(-1), np.ones(B), rtol=1e-4
    )


def test_relational_grads_naive_vs_xla():
    B, n, c, h = 2, 6, 5, 8
    kw = dict(
        obj_dim=c,
        q_dim=h,
        g_layers=(32, 32),
        f_layers=(16,),
        n_answers=7,
        question_injection_position=1,
        dropout=0.0,
        dtype=jnp.float32,
    )
    x = jax.random.normal(jax.random.key(1), (B, n, c))
    q = jax.random.normal(jax.random.key(2), (B, h))
    m_naive = RelationalLayer(impl="naive", **kw)
    m_xla = RelationalLayer(impl="xla", **kw)
    params = m_naive.init(jax.random.key(0), x, q)

    def loss(p, m):
        return -m.apply(p, x, q)[:, 0].mean()

    gn = jax.grad(loss)(params, m_naive)
    gx = jax.grad(loss)(params, m_xla)
    tol = 1e-5 if jax.default_backend() == "cpu" else 1e-3
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=tol
        ),
        gn,
        gx,
    )


@pytest.mark.parametrize("impl", ["naive", "xla"])
def test_object_mask_excludes_pad_pairs(impl):
    """--object-mask (SURVEY.md 3.4's optional knob): pad-object pairs leave
    the relational sum entirely, so (a) garbage in pad rows cannot change the
    output, and (b) the masked result equals evaluating on the truncated real
    object set. Default-off behavior (reference parity) is pinned by the
    garbage-sensitivity check."""
    B, n, c, h = 3, 6, 5, 8
    kw = dict(
        obj_dim=c,
        q_dim=h,
        g_layers=(32, 32),
        f_layers=(16,),
        n_answers=7,
        question_injection_position=1,
        dropout=0.0,
        dtype=jnp.float32,
    )
    n_objects = jnp.asarray([3, 6, 4], jnp.int32)
    x = jax.random.normal(jax.random.key(1), (B, n, c))
    row_valid = jnp.arange(n)[None, :] < n_objects[:, None]
    x_zero = jnp.where(row_valid[..., None], x, 0.0)
    x_garbage = jnp.where(
        row_valid[..., None], x, 37.0 * jax.random.normal(jax.random.key(9), x.shape)
    )
    q = jax.random.normal(jax.random.key(2), (B, h))
    masked = RelationalLayer(impl=impl, object_mask=True, **kw)
    params = masked.init(jax.random.key(0), x_zero, q)
    out_zero = masked.apply(params, x_zero, q, n_objects=n_objects)
    out_garbage = masked.apply(params, x_garbage, q, n_objects=n_objects)
    np.testing.assert_allclose(
        np.asarray(out_zero), np.asarray(out_garbage), rtol=1e-5, atol=1e-5
    )
    # truncated-set equivalence, per sample (n = n_real, no pads at all)
    for k in range(B):
        m = int(n_objects[k])
        out_trunc = masked.apply(
            params, x_zero[k : k + 1, :m], q[k : k + 1],
            n_objects=n_objects[k : k + 1],
        )
        np.testing.assert_allclose(
            np.asarray(out_trunc[0]), np.asarray(out_zero[k]), rtol=1e-4, atol=1e-5
        )
    # the knob must not silently no-op: applying without n_objects (the
    # from-pixels pipelines carry none) raises instead of training unmasked
    with pytest.raises(ValueError, match="n_objects"):
        masked.apply(params, x_zero, q)
    # reference default (mask off): zero pads DO contribute (bias terms), and
    # garbage pads change the answer — the knob is load-bearing.
    unmasked = RelationalLayer(impl=impl, object_mask=False, **kw)
    u_zero = unmasked.apply(params, x_zero, q)
    u_garbage = unmasked.apply(params, x_garbage, q)
    assert not np.allclose(np.asarray(u_zero), np.asarray(u_garbage), atol=1e-3)
    assert not np.allclose(np.asarray(u_zero), np.asarray(out_zero), atol=1e-3)


def test_pair_dropout_scaling():
    B, n, c, h = 4, 8, 6, 8
    kw = dict(
        obj_dim=c, q_dim=h, g_layers=(32, 32), f_layers=(16,), n_answers=7,
        question_injection_position=0, dropout=0.0, dtype=jnp.float32,
    )
    x = jax.random.normal(jax.random.key(1), (B, n, c))
    q = jax.random.normal(jax.random.key(2), (B, h))
    m0 = RelationalLayer(impl="xla", pair_dropout=0.0, **kw)
    m5 = RelationalLayer(impl="xla", pair_dropout=0.5, **kw)
    params = m0.init(jax.random.key(0), x, q)
    base = m0.apply(params, x, q, train=False)
    # eval: pair dropout off -> identical
    same = m5.apply(params, x, q, train=False)
    np.testing.assert_allclose(np.asarray(base), np.asarray(same), atol=1e-6)
    # train: stochastic but different from base
    out = m5.apply(
        params, x, q, train=True, rngs={"dropout": jax.random.key(3)}
    )
    assert not np.allclose(np.asarray(base), np.asarray(out))


def test_grid_coords():
    c = grid_coords(8)
    assert c.shape == (64, 2)
    np.testing.assert_allclose(np.asarray(c[0]), [-1, -1])
    np.testing.assert_allclose(np.asarray(c[7]), [1, -1])  # end of first row
    np.testing.assert_allclose(np.asarray(c[63]), [1, 1])


@pytest.mark.parametrize("model", ["original-sd", "original-fp"])
def test_rn_forward_shapes(model):
    cfg = load_config(model, overrides={"compute_dtype": "float32", "rl_impl": "xla"})
    # shrink for test speed
    if not cfg.state_description:
        cfg = cfg.replace(image_size=64, g_layers=(64,) * 4, f_layers=(32, 32))
    else:
        cfg = cfg.replace(g_layers=(64,) * 4, f_layers=(32, 32), lstm_hidden=32)
    m = RN(cfg=cfg, vocab_size=V)
    B = 2
    if cfg.state_description:
        inputs = jax.random.normal(jax.random.key(0), (B, cfg.max_objects, 18))
    else:
        inputs = jax.random.randint(
            jax.random.key(0), (B, cfg.image_size, cfg.image_size, 3), 0, 255
        ).astype(jnp.uint8)
    qst = jnp.ones((B, cfg.question_max_len), dtype=jnp.int32)
    params = m.init(jax.random.key(0), inputs, qst, train=False)
    out = m.apply(params, inputs, qst, train=False)
    assert out.shape == (B, 28)
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(-1), np.ones(B), rtol=1e-4)


def test_rn_extract_ir_model():
    cfg = load_config(
        "ir-sd",
        overrides={"compute_dtype": "float32", "rl_impl": "xla"},
    ).replace(g_layers=(64,) * 4, f_layers=(32,), lstm_hidden=32)
    m = RN(cfg=cfg, vocab_size=V)
    B = 2
    inputs = jax.random.normal(jax.random.key(0), (B, cfg.max_objects, 18))
    qst = jnp.ones((B, cfg.question_max_len), dtype=jnp.int32)
    params = m.init(jax.random.key(0), inputs, qst, train=False)
    feats = m.apply(params, inputs, method=RN.extract)
    assert feats.shape == (B, 64)  # g_layers[inject-1]
    # question-independence: extraction never touches text/LSTM params
    m0 = RN(cfg=cfg.replace(question_injection_position=0), vocab_size=V)
    with pytest.raises(ValueError):
        m0.apply(
            m0.init(jax.random.key(0), inputs, qst, train=False),
            inputs,
            method=RN.extract,
        )


def test_lstm_fixed_max_vs_per_batch_padding_every_length():
    """Fixed-max padding == per-batch-max padding for every question length.

    The reference pads questions to the *batch* max (SURVEY.md 2.6); we pad
    to config maxima for static jit shapes. This pins the documented claim
    that the mask-aware LSTM makes the two encodings identical at every real
    length, in both token orders (plain and --invert-questions).
    """
    T_FIXED = 20
    m = QuestionEmbedModel(vocab_size=V, emb_dim=8, hidden=16)
    rng = np.random.RandomState(0)
    params = m.init(jax.random.key(1), jnp.zeros((1, T_FIXED), jnp.int32))
    for L in range(1, T_FIXED + 1):
        toks = rng.randint(1, V, size=(2, L)).astype(np.int32)
        per_batch = jnp.asarray(toks)  # batch-max == L, no padding
        fixed = jnp.zeros((2, T_FIXED), jnp.int32).at[:, :L].set(toks)
        np.testing.assert_allclose(
            np.asarray(m.apply(params, per_batch)),
            np.asarray(m.apply(params, fixed)),
            atol=1e-6,
            err_msg=f"L={L} plain",
        )
        # inverted: pads-first layout (full-row reversal of the padded row)
        inv_pb = jnp.asarray(toks[:, ::-1])
        inv_fixed = jnp.asarray(np.asarray(fixed)[:, ::-1])
        np.testing.assert_allclose(
            np.asarray(m.apply(params, inv_pb)),
            np.asarray(m.apply(params, inv_fixed)),
            atol=1e-6,
            err_msg=f"L={L} inverted",
        )


def test_pair_pool_mean_is_reparameterized_sum():
    """pair_pool='mean' == pair_pool='sum' with f0 scaled by n^2 (the
    reparameterization identity that makes 'mean' parity-safe), and the two
    impls agree under 'mean'. The knob exists because at n=1024 the raw sum
    saturates f at init (grad norm ~1e5 measured) — see ModelConfig.pair_pool."""
    B, n, c, h = 2, 6, 5, 8
    kw = dict(
        obj_dim=c, q_dim=h, g_layers=(32, 32), f_layers=(16,), n_answers=7,
        question_injection_position=0, dropout=0.0, dtype=jnp.float32,
    )
    x = jax.random.normal(jax.random.key(1), (B, n, c))
    q = jax.random.normal(jax.random.key(2), (B, h))
    m_mean = RelationalLayer(impl="naive", pair_pool="mean", **kw)
    m_sum = RelationalLayer(impl="naive", pair_pool="sum", **kw)
    params = m_mean.init(jax.random.key(0), x, q)
    out_mean = m_mean.apply(params, x, q)
    # scale f0 by n^2: f(sum(a) @ (W/n^2)) == f(mean(a) @ W)
    import flax

    scaled = flax.core.unfreeze(params)
    scaled["params"]["f0_kernel"] = scaled["params"]["f0_kernel"] / (n * n)
    out_sum_scaled = m_sum.apply(scaled, x, q)
    np.testing.assert_allclose(
        np.asarray(out_mean), np.asarray(out_sum_scaled), rtol=2e-5, atol=2e-5
    )
    m_mean_xla = RelationalLayer(impl="xla", pair_pool="mean", **kw)
    np.testing.assert_allclose(
        np.asarray(out_mean), np.asarray(m_mean_xla.apply(params, x, q)),
        rtol=1e-4, atol=1e-4,
    )


def test_pair_pool_validation():
    from rnet.config import load_config

    with pytest.raises(ValueError, match="pair_pool"):
        load_config("original-fp", overrides={"pair_pool": "max"})
    assert load_config("stretch-fp-32").pair_pool == "mean"
    assert load_config("original-fp").pair_pool == "sum"  # reference parity
