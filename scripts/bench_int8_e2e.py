#!/usr/bin/env python
"""End-to-end int8 inference benchmark on a NAMED config (VERDICT r2 item 3).

Measures the FULL model eval step (uint8 images -> conv -> LSTM -> pairwise
core -> f_phi) at the given batch size, bf16 pairwise vs int8-MXU pairwise
(--rl-impl pallas_int8), via the audited device-loop protocol. The int8 win
must show up here, not just in the kernel microbench — wide-fp (H=512 g/f)
is the shipping shape where the quantize/dequantize VPU work amortizes.

Usage: PYTHONPATH=/root/.axon_site:. JAX_PLATFORMS=axon \
           python scripts/bench_int8_e2e.py [model] [batch_size]
"""
import sys; sys.path.insert(0, ".")
from functools import partial

import jax
import jax.numpy as jnp

from rnet.config import load_config
from rnet.models import RN
from rnet.train.loop import make_injected_optimizer
from rnet.train.steps import create_train_state, eval_step
from rnet.utils.timing import device_loop_time

model_name = sys.argv[1] if len(sys.argv) > 1 else "wide-fp"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 512
rng = jax.random.key(0)
times = {}
for impl in ("auto", "pallas_int8"):
    cfg = load_config(model_name, overrides={"rl_impl": impl})
    model = RN(cfg=cfg, vocab_size=90)
    opt = make_injected_optimizer(1e-4, clip_norm=50.0)
    batch = {
        "image": jax.random.randint(rng, (B, cfg.image_size, cfg.image_size, 3), 0, 255, jnp.int32).astype(jnp.uint8),
        "question": jax.random.randint(rng, (B, cfg.question_max_len), 1, 80, jnp.int32),
        "answer": jax.random.randint(rng, (B,), 0, 28, jnp.int32),
    }
    state = create_train_state(model, cfg, opt, rng, batch)
    es = partial(eval_step, model=model, cfg=cfg)

    @partial(jax.jit, static_argnums=(2,))
    def loop(state0, batch, K):
        # anti-hoist: make the batch depend on the carry through a dynamic
        # predicate XLA cannot fold (0.0-multiplies get simplified away and
        # the body hoists out of the loop — see bench_train_breakdown.py)
        def body(i, acc):
            b2 = dict(batch)
            b2["question"] = jnp.where(acc < 0, 1, batch["question"])
            out = es(state0, b2)
            return acc + out["correct"].sum().astype(jnp.float32)

        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    t = device_loop_time(lambda K: (lambda: loop(state, batch, K)))
    times[impl] = t
    print(f"{model_name} eval step B={B} rl_impl={impl:<12s} "
          f"{t*1e3:7.3f} ms  ({B/t:,.0f} q/s)")

print(f"int8 end-to-end speedup: {times['auto']/times['pallas_int8']:.2f}x")
