#!/usr/bin/env python
"""Serving-latency sweep: on-chip eval-step time vs batch size.

The throughput benches (bench.py, bench_int8_e2e.py) answer "questions/sec
at saturation"; production serving also needs the LATENCY curve — how long
one dispatched batch takes at small B, where the n^2 pair matmuls may be too
thin to fill the MXU. Measures the full eval step (uint8 image -> conv ->
LSTM -> pairwise core -> f_phi -> argmax) per batch size with the audited
device-loop protocol (rnet/utils/timing.py), so the numbers are chip time,
independent of this container's ~30 ms relay round-trip (a real deployment
talks to the chip directly).

Usage: PYTHONPATH=/root/.axon_site:. JAX_PLATFORMS=axon \
           python scripts/bench_latency.py [model] [rl_impl] [B ...]
Defaults: original-fp auto 1 8 32 64 128 512.
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

model_name = sys.argv[1] if len(sys.argv) > 1 else "original-fp"
impl = sys.argv[2] if len(sys.argv) > 2 else "auto"
batches = [int(b) for b in sys.argv[3:]] or [1, 8, 32, 64, 128, 512]

cfg = load_config(model_name, overrides={"rl_impl": impl})
model = RN(cfg=cfg, vocab_size=90)
opt = make_injected_optimizer(1e-4, clip_norm=50.0)
rng = jax.random.key(0)

print(f"{model_name} rl_impl={impl} eval-step latency (chip time)")
print(f"{'B':>5s} {'ms/batch':>10s} {'ms/question':>12s} {'q/s':>10s}")
rows = []
for B in batches:
    batch = {
        "image": jax.random.randint(
            rng, (B, cfg.image_size, cfg.image_size, 3), 0, 255, jnp.int32
        ).astype(jnp.uint8),
        "question": jax.random.randint(rng, (B, cfg.question_max_len), 1, 80, jnp.int32),
        "answer": jax.random.randint(rng, (B,), 0, 28, jnp.int32),
    }
    state = create_train_state(model, cfg, opt, rng, batch)
    es = partial(eval_step, model=model, cfg=cfg)

    @partial(jax.jit, static_argnums=(2,))
    def loop(state0, batch, K):
        # anti-hoist: batch depends on the carry through a dynamic predicate
        # (see bench_train_breakdown.py — 0.0-multiplies get folded away)
        def body(i, acc):
            b2 = dict(batch)
            b2["question"] = jnp.where(acc < 0, 1, batch["question"])
            out = es(state0, b2)
            return acc + out["correct"].sum().astype(jnp.float32)

        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    t = device_loop_time(lambda K: (lambda: loop(state, batch, K)))
    rows.append((B, t))
    print(f"{B:>5d} {t*1e3:>10.3f} {t*1e3/B:>12.4f} {B/t:>10,.0f}")

b0, t0 = rows[0]
bN, tN = rows[-1]
print(
    f"batch {b0} -> {bN}: latency {t0*1e3:.2f} -> {tN*1e3:.2f} ms "
    f"({tN/t0:.1f}x time for {bN//b0}x questions)"
)
