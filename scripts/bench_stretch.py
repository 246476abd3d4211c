#!/usr/bin/env python
"""Stretch 16x16-grid (65k pairs) full train-step benchmark (run on TPU)."""
import sys; sys.path.insert(0, ".")
from functools import partial
import jax, jax.numpy as jnp
from rnet.config import load_config
from rnet.models import RN
from rnet.train.loop import make_injected_optimizer
from rnet.train.steps import create_train_state, train_step
from rnet.utils.timing import device_loop_time

for B in (64, 128):
    cfg = load_config('stretch-fp-16', overrides={'rl_impl':'auto'})
    assert cfg.grid == 16 and cfg.n_objects == 256
    model = RN(cfg=cfg, vocab_size=90)
    opt = make_injected_optimizer(1e-4, clip_norm=50.0)
    rng = jax.random.key(0)
    batch = {
        'image': jax.random.randint(rng,(B,128,128,3),0,255,jnp.int32).astype(jnp.uint8),
        'question': jax.random.randint(rng,(B,48),1,80,jnp.int32),
        'answer': jax.random.randint(rng,(B,),0,28,jnp.int32),
    }
    state = create_train_state(model, cfg, opt, rng, batch)
    step = partial(train_step, model=model, cfg=cfg, optimizer=opt)
    @partial(jax.jit, static_argnums=(2,))
    def loop(state0, batch, K):
        def body(i, carry):
            st, _ = carry
            st, m = step(st, batch)
            return (st, m['loss'])
        _, loss = jax.lax.fori_loop(0, K, body, (state0, jnp.float32(0)))
        return loss
    t = device_loop_time(lambda K: (lambda: loop(state, batch, K)))
    pair_flops = 2*B*256*256*(3*256*256 + 256)
    print(f'stretch-fp-16 train step B={B}: {t*1e3:.2f} ms -> {B/t:.0f} q/s '
          f'(~{3*pair_flops/t/1e12:.0f} TF/s incl bwd est)')
