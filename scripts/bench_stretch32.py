#!/usr/bin/env python
"""Stretch 32x32-grid (1,048,576 pairs/question) train-step benchmark.

VERDICT r2 item 8: the long-context analog pushed to 1M pairs — a scale the
reference's literal pair materialization could never reach (the (B, 2^20,
2c+h) pair tensor at B=16 fp32 would be ~12 TB). The fused kernel streams
j-tiles through VMEM, so HBM holds only objects + the running sum.

Config stretch-fp-32: 2 conv layers -> 32x32 grid, n=1024 objects.
_tiles(1024) -> TI=16 (16*128=2048 rows cap), TJ=128.

Usage: PYTHONPATH=/root/.axon_site:. JAX_PLATFORMS=axon \
           python scripts/bench_stretch32.py [B ...]
"""
import sys; sys.path.insert(0, ".")
from functools import partial
import jax, jax.numpy as jnp
from rnet.config import load_config
from rnet.models import RN
from rnet.train.loop import make_injected_optimizer
from rnet.train.steps import create_train_state, train_step
from rnet.utils.timing import device_loop_time

batches = [int(a) for a in sys.argv[1:]] or [8, 16]
for B in batches:
    cfg = load_config('stretch-fp-32', overrides={'rl_impl': 'auto'})
    assert cfg.grid == 32 and cfg.n_objects == 1024
    model = RN(cfg=cfg, vocab_size=90)
    opt = make_injected_optimizer(1e-4, clip_norm=50.0)
    rng = jax.random.key(0)
    batch = {
        'image': jax.random.randint(rng, (B, 128, 128, 3), 0, 255, jnp.int32).astype(jnp.uint8),
        'question': jax.random.randint(rng, (B, 48), 1, 80, jnp.int32),
        'answer': jax.random.randint(rng, (B,), 0, 28, jnp.int32),
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
    n = 1024
    pair_flops = 2 * B * n * n * (3 * 256 * 256 + 256)
    print(f'stretch-fp-32 train step B={B}: {t*1e3:.2f} ms -> {B/t:.1f} q/s '
          f'(~{4*pair_flops/t/1e12:.0f} TF/s fwd+bwd est, 1,048,576 pairs/q)')
