"""Golden parity: rnet (JAX, fp32) vs the independent torch oracle.

Weights are transplanted torch -> flax; forward outputs must match to fp32
tolerance for every module and the full RN (both variants). Substitutes for
the missing reference runtime (SURVEY.md section 4 item 2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from rnet.config import load_config
from rnet.models import RN
from rnet.models.conv import ConvInputModel
from rnet.models.relational import RelationalLayer
from rnet.models.text import QuestionEmbedModel

import torch_oracle as oracle

V = 40


def _small_fp_cfg():
    return load_config(
        "original-fp", overrides={"compute_dtype": "float32", "rl_impl": "xla"}
    ).replace(
        image_size=32,
        g_layers=(48, 48, 48, 48),
        f_layers=(32, 32),
        lstm_hidden=24,
        lstm_word_emb=8,
        dropout=0.0,
    )


def _small_sd_cfg():
    return load_config(
        "original-sd", overrides={"compute_dtype": "float32", "rl_impl": "xla"}
    ).replace(
        g_layers=(48, 48, 48),
        f_layers=(32,),
        lstm_hidden=24,
        lstm_word_emb=8,
        dropout=0.0,
        max_objects=6,
    )


def test_conv_parity():
    torch.manual_seed(0)
    om = oracle.OracleConv().eval()
    # put nontrivial running stats in place
    with torch.no_grad():
        for bn in om.bns:
            bn.running_mean.uniform_(-0.5, 0.5)
            bn.running_var.uniform_(0.5, 1.5)
    x = np.random.RandomState(0).rand(2, 3, 64, 64).astype(np.float32)
    ref = om(torch.from_numpy(x)).detach().numpy()

    m = ConvInputModel(dtype=jnp.float32)
    p, s = oracle.conv_params(om)
    out = m.apply(
        {"params": p, "batch_stats": s},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5
    )


def test_lstm_parity():
    torch.manual_seed(1)
    om = oracle.OracleText(V, 8, 16).eval()
    tokens = np.array(
        [[3, 9, 2, 7, 0, 0], [5, 1, 0, 0, 0, 0]], dtype=np.int64
    )
    ref = om(torch.from_numpy(tokens)).detach().numpy()
    m = QuestionEmbedModel(vocab_size=V, emb_dim=8, hidden=16)
    out = m.apply(
        {"params": oracle.text_params(om)}, jnp.asarray(tokens, dtype=jnp.int32)
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("inject", [0, 1])
@pytest.mark.parametrize("impl", ["naive", "xla"])
def test_relational_parity(inject, impl):
    torch.manual_seed(2)
    B, n, c, h = 2, 5, 7, 12
    om = oracle.OracleRelational(c, h, (32, 32, 32), (24,), 9, inject, 0.0).eval()
    x = np.random.RandomState(1).randn(B, n, c).astype(np.float32)
    q = np.random.RandomState(2).randn(B, h).astype(np.float32)
    ref = om(torch.from_numpy(x), torch.from_numpy(q)).detach().numpy()
    m = RelationalLayer(
        obj_dim=c,
        q_dim=h,
        g_layers=(32, 32, 32),
        f_layers=(24,),
        n_answers=9,
        question_injection_position=inject,
        dropout=0.0,
        impl=impl,
        dtype=jnp.float32,
    )
    out = m.apply(
        {"params": oracle.relational_params(om)}, jnp.asarray(x), jnp.asarray(q)
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_full_rn_parity_from_pixels():
    torch.manual_seed(3)
    cfg = _small_fp_cfg()
    om = oracle.OracleRN(cfg, V).eval()
    B = 2
    rs = np.random.RandomState(3)
    img = rs.rand(B, 3, cfg.image_size, cfg.image_size).astype(np.float32)
    tokens = rs.randint(1, V, size=(B, 10)).astype(np.int64)
    tokens[:, 7:] = 0  # trailing pads
    ref = om(torch.from_numpy(img), torch.from_numpy(tokens)).detach().numpy()

    m = RN(cfg=cfg, vocab_size=V)
    variables = oracle.rn_variables(om)
    out = m.apply(
        variables,
        jnp.asarray(img.transpose(0, 2, 3, 1)),
        jnp.asarray(tokens, dtype=jnp.int32),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)


def test_full_rn_parity_state_description():
    torch.manual_seed(4)
    cfg = _small_sd_cfg()
    om = oracle.OracleRN(cfg, V).eval()
    B = 3
    rs = np.random.RandomState(4)
    objs = rs.randn(B, cfg.max_objects, cfg.object_dim).astype(np.float32)
    objs[:, 4:] = 0.0  # padding objects participate as zero vectors
    tokens = rs.randint(1, V, size=(B, 12)).astype(np.int64)
    tokens[:, 9:] = 0
    ref = om(torch.from_numpy(objs), torch.from_numpy(tokens)).detach().numpy()

    m = RN(cfg=cfg, vocab_size=V)
    out = m.apply(
        oracle.rn_variables(om),
        jnp.asarray(objs),
        jnp.asarray(tokens, dtype=jnp.int32),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_rn_backward_parity_state_description():
    """NLL-loss gradients match torch autograd after transplant."""
    torch.manual_seed(5)
    cfg = _small_sd_cfg()
    om = oracle.OracleRN(cfg, V).train()
    for m_ in om.modules():
        if isinstance(m_, torch.nn.Dropout):
            m_.eval()  # dropout off; keep BN-free SD path deterministic
    B = 3
    rs = np.random.RandomState(5)
    objs = rs.randn(B, cfg.max_objects, cfg.object_dim).astype(np.float32)
    tokens = rs.randint(1, V, size=(B, 12)).astype(np.int64)
    tokens[:, 9:] = 0
    labels = rs.randint(0, cfg.n_answers, size=(B,))

    out = om(torch.from_numpy(objs), torch.from_numpy(tokens))
    loss = torch.nn.functional.nll_loss(out, torch.from_numpy(labels))
    loss.backward()
    ref_g0 = om.rel.g[0].weight.grad.detach().numpy().T

    m = RN(cfg=cfg, vocab_size=V)
    variables = oracle.rn_variables(om)

    def loss_fn(params):
        logp = m.apply(
            {"params": params},
            jnp.asarray(objs),
            jnp.asarray(tokens, dtype=jnp.int32),
            train=False,
        )
        return -logp[jnp.arange(B), jnp.asarray(labels)].mean()

    jl, grads = jax.value_and_grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(float(jl), float(loss.item()), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(grads["relational"]["g0_kernel"]), ref_g0, rtol=1e-3, atol=1e-6
    )
