#!/usr/bin/env python
"""Train-step roofline: fwd+bwd time per component + optimizer overhead.

Round-3 ask (VERDICT.md Weak #6): ~17% of the 20.7 ms B=512 train step is
non-pairwise; decompose it so the remaining levers (or the proof that ~25k
q/s is the floor) are measured, not guessed. Every number uses the audited
device-side fori_loop differencing protocol (rnet/utils/timing.py).

Usage: PYTHONPATH=/root/.axon_site:. JAX_PLATFORMS=axon \
           python scripts/bench_train_breakdown.py [batch_size]
"""
import sys

sys.path.insert(0, ".")
from functools import partial

import jax
import jax.numpy as jnp
import optax

from rnet.config import load_config
from rnet.models import RN
from rnet.models.conv import ConvInputModel
from rnet.models.text import QuestionEmbedModel
from rnet.train.loop import make_injected_optimizer
from rnet.train.steps import create_train_state, train_step
from rnet.utils.timing import device_loop_time

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
import os
_ONLY = set(filter(None, os.environ.get("RNET_BD_ONLY", "").split(",")))
def want(name):
    return not _ONLY or name in _ONLY
cfg = load_config("original-fp")
rng = jax.random.key(0)


def grad_loop(loss_fn, params):
    """K-step fori_loop of value_and_grad(loss_fn), hoist/DCE-proof.

    `p + 0.0*g` is NOT safe: XLA's simplifier folds it for pure-XLA graphs
    (the first run measured conv fwd+bwd as 0.000 ms — the whole body hoisted
    out of the loop as invariant). The grads must (a) feed the accumulator
    through full reductions and (b) perturb the params by a value-dependent
    (numerically negligible) epsilon so no iteration is provably identical.
    Pallas-containing graphs happened to survive the old pattern (pairwise
    measured 17.176 ms = 8x the audited B=64 number), but use this for all.
    """

    @partial(jax.jit, static_argnums=(1,))
    def loop(p0, K):
        def body(i, carry):
            p, acc = carry
            val, g = jax.value_and_grad(loss_fn)(p)
            gsum = sum(l.astype(jnp.float32).sum() for l in jax.tree.leaves(g))
            p = jax.tree.map(lambda a, b: a + (1e-30 * b).astype(a.dtype), p, g)
            return (p, acc + val.astype(jnp.float32) + gsum * 1e-20)

        _, acc = jax.lax.fori_loop(0, K, body, (p0, jnp.float32(0)))
        return acc

    return loop


def report(name, loss_fn, params):
    # ONE jitted loop reused across K values: instantiating grad_loop inside
    # the timed lambda would retrace per call and the differencing would
    # measure trace/cache constants instead of steps (the first two runs of
    # this script printed conv fwd+bwd as 0.000 ms exactly this way).
    loop = grad_loop(loss_fn, params)
    t = device_loop_time(lambda K: (lambda: loop(params, K)))
    print(f"{name:<34s} {t*1e3:8.3f} ms")
    return t


results = {}

# ---- full train step (the headline step; includes Adam/clip/metrics) ----
model = RN(cfg=cfg, vocab_size=90)
opt = make_injected_optimizer(1e-4, clip_norm=50.0)
batch = {
    "image": jax.random.randint(rng, (B, cfg.image_size, cfg.image_size, 3), 0, 255, jnp.int32).astype(jnp.uint8),
    "question": jax.random.randint(rng, (B, cfg.question_max_len), 1, 80, jnp.int32),
    "answer": jax.random.randint(rng, (B,), 0, 28, jnp.int32),
}
state = create_train_state(model, cfg, opt, rng, batch)
step = partial(train_step, model=model, cfg=cfg, optimizer=opt)


@partial(jax.jit, static_argnums=(2,))
def steploop(state0, batch, K):
    def body(i, carry):
        st, _ = carry
        st, m = step(st, batch)
        return (st, m["loss"])

    _, loss = jax.lax.fori_loop(0, K, body, (state0, jnp.float32(0)))
    return loss


t_full = None
if want("step"):
    t_full = device_loop_time(lambda K: (lambda: steploop(state, batch, K)))
    print(f"{'full train step':<34s} {t_full*1e3:8.3f} ms   ({B/t_full:,.0f} q/s)")

# ---- full fwd+bwd only (no optimizer, no metrics): isolates update cost ----
img_f = (batch["image"].astype(jnp.float32) / 255.0).astype(jnp.bfloat16)


def rn_loss(params):
    out = model.apply(
        {"params": params, "batch_stats": state.batch_stats},
        batch["image"], batch["question"], train=True,
        rngs={"dropout": jax.random.key(1)}, mutable=["batch_stats"],
    )
    logp, _ = out
    return -jnp.take_along_axis(logp, batch["answer"][:, None], axis=1).mean()


t_fb = report("RN fwd+bwd (no opt)", rn_loss, state.params) if want("rn") else None

# ---- conv fwd+bwd ----
conv = ConvInputModel(dtype=jnp.bfloat16)
cvars = conv.init(rng, img_f, train=False)


def conv_loss(p):
    out, _ = conv.apply(
        {"params": p, "batch_stats": cvars["batch_stats"]},
        img_f, train=True, mutable=["batch_stats"],
    )
    return out.astype(jnp.float32).sum()


t_conv = report("conv(+BN) fwd+bwd", conv_loss, cvars["params"]) if want("conv") else None

# ---- LSTM fwd+bwd ----
text = QuestionEmbedModel(vocab_size=90, emb_dim=cfg.lstm_word_emb, hidden=cfg.lstm_hidden)
tvars = text.init(rng, batch["question"])


def text_loss(p):
    return text.apply({"params": p}, batch["question"]).astype(jnp.float32).sum()


t_lstm = report("LSTM fwd+bwd", text_loss, tvars["params"]) if want("lstm") else None

# ---- optimizer alone (clip + global-norm metric + Adam on the real tree) ----
@partial(jax.jit, static_argnums=(1,))
def opt_loop(state0, K):
    def body(i, carry):
        opt_state, params, acc = carry
        g = jax.tree.map(lambda p: p * 1e-9, params)  # grad-like, iteration-dep
        updates, opt_state = opt.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        gn = optax.global_norm(g)
        return (opt_state, params, acc + gn)

    _, _, acc = jax.lax.fori_loop(0, K, body, (state0.opt_state, state0.params, jnp.float32(0)))
    return acc


t_opt = None
if want("opt"):
    t_opt = device_loop_time(lambda K: (lambda: opt_loop(state, K)))
    print(f"{'optimizer+clip+grad_norm':<34s} {t_opt*1e3:8.3f} ms")

# ---- pairwise core fwd+bwd at this batch (the known floor) ----
import numpy as np

from rnet.kernels.pairwise import pairwise_core

n, H, L = cfg.grid * cfg.grid, cfg.g_layers[0], len(cfg.g_layers)
ks = jax.random.split(rng, 6)
u = jax.random.normal(ks[0], (B, n, H), jnp.bfloat16) * 0.3
v = jax.random.normal(ks[1], (B, n, H), jnp.bfloat16) * 0.3
s_ = jax.random.normal(ks[2], (B, H), jnp.bfloat16) * 0.1
qa = jnp.zeros((B, H), jnp.bfloat16)
pws = (jax.random.normal(ks[4], (L - 1, H, H)) / np.sqrt(H)).astype(jnp.bfloat16)
pbs = (jax.random.normal(ks[5], (L - 1, H)) * 0.05).astype(jnp.bfloat16)

gfn = jax.value_and_grad(
    lambda uu, ww: pairwise_core(uu, v, s_, qa, ww, pbs, inject=0).sum(), argnums=(0, 1)
)


@partial(jax.jit, static_argnums=(1,))
def pw_loop(u0, K):
    # same anti-hoist contract as grad_loop: perturb the input by a
    # value-dependent epsilon (0.0-multiplies fold for pure-XLA fallbacks)
    def body(i, carry):
        uc, acc = carry
        val, (du, dws) = gfn(uc, pws)
        uc = uc + (1e-30 * du).astype(uc.dtype)
        return (uc, acc + val + du.astype(jnp.float32).sum() * 1e-20 + dws.astype(jnp.float32).sum() * 1e-20)

    _, acc = jax.lax.fori_loop(0, K, body, (u0, jnp.float32(0)))
    return acc


t_pw = None
if want("pw"):
    t_pw = device_loop_time(lambda K: (lambda: pw_loop(u, K)))
    print(f"{'pairwise core fwd+bwd':<34s} {t_pw*1e3:8.3f} ms")

if None not in (t_full, t_fb):
    print("-" * 56)
    print(f"{'residual: step - fwd/bwd (opt etc.)':<34s} {(t_full-t_fb)*1e3:8.3f} ms")
if None not in (t_fb, t_pw, t_conv, t_lstm):
    print(
        f"{'residual: fwd/bwd - (pw+conv+lstm)':<34s} "
        f"{(t_fb - t_pw - t_conv - t_lstm)*1e3:8.3f} ms  (f_phi, coords, sum, misc)"
    )
