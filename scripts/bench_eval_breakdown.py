#!/usr/bin/env python
"""Eval wall-clock roofline: device rate vs end-to-end rate, fetch costs.

Round-3 ask (VERDICT.md item 8): train got a measured breakdown proving
~25.4k q/s is the practical floor; eval sat at 88.5k wall vs 109k device
(~81%) with the gap unattributed. This script measures, with the audited
device-loop protocol where applicable:

  1. device-side eval-step rate (fori_loop differencing — the ceiling),
  2. the relay round-trip cost of ONE packed (K, bs+1) int32 chunk fetch
     vs the old 4-array fetch (pred/label/valid/nll),
  3. end-to-end `_eval_epoch_device` wall q/s on a synthetic device-resident
     split, before/after comparison lives in RESULTS.md.

Usage: PYTHONPATH=/root/.axon_site:. JAX_PLATFORMS=axon \
           python scripts/bench_eval_breakdown.py [batch_size] [n_val]
"""
import sys, time

sys.path.insert(0, ".")
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rnet.config import load_config
from rnet.models import RN
from rnet.train.loop import make_injected_optimizer
from rnet.train.steps import create_train_state, eval_step, make_chunked_steps
from rnet.utils.timing import device_loop_time

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
NVAL = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
C = 10  # chunk steps per dispatch (the Trainer's log_interval default)

cfg = load_config("original-fp")
rng = jax.random.key(0)
model = RN(cfg=cfg, vocab_size=90)
opt = make_injected_optimizer(1e-4, clip_norm=50.0)
batch = {
    "image": jax.random.randint(rng, (B, cfg.image_size, cfg.image_size, 3), 0, 255, jnp.int32).astype(jnp.uint8),
    "question": jax.random.randint(rng, (B, cfg.question_max_len), 1, 80, jnp.int32),
    "answer": jax.random.randint(rng, (B,), 0, 28, jnp.int32),
}
state = create_train_state(model, cfg, opt, rng, batch)

# ---- 1. device-side ceiling (differenced fori_loop of eval_step) ----
es = partial(eval_step, model=model, cfg=cfg)


@partial(jax.jit, static_argnums=(2,))
def loop(state0, batch, K):
    def body(i, acc):
        b2 = dict(batch)
        b2["question"] = batch["question"] + (acc * 0.0).astype(jnp.int32)
        out = es(state0, b2)
        return acc + out["correct"].sum().astype(jnp.float32)
    return jax.lax.fori_loop(0, K, body, jnp.float32(0))


t_dev = device_loop_time(lambda K: (lambda: loop(state, batch, K)))
print(f"{'device eval step':<38s} {t_dev*1e3:8.3f} ms  ({B/t_dev:,.0f} q/s ceiling)")

# ---- 2. relay costs: H2D put, packed fetch, 4-array fetch ----
# DISTINCT arrays per rep: jax caches the host copy of a fetched array, so
# re-fetching the same one measures nothing (first run of this script did).
reps = 12
base = jnp.zeros((C, B + 1), jnp.int32)
packs = [jax.device_put(base + i) for i in range(reps)]
fours = [
    (
        jax.device_put(jnp.full((C, B), i, jnp.int32)),
        jax.device_put(jnp.full((C, B), i, jnp.int32)),
        jax.device_put(jnp.zeros((C, B), jnp.bool_) | (i % 2 == 0)),
        jax.device_put(jnp.full((C,), float(i), jnp.float32)),
    )
    for i in range(reps)
]
np.asarray(packs[0]); [np.asarray(a) for a in fours[0]]  # drain the queue
t0 = time.perf_counter()
for p in packs[1:]:
    np.asarray(p)
t_packed = (time.perf_counter() - t0) / (reps - 1)
t0 = time.perf_counter()
for f4 in fours[1:]:
    for a in f4:
        np.asarray(a)
t_four = (time.perf_counter() - t0) / (reps - 1)
host_idx = np.zeros((C, B), np.int32)
t0 = time.perf_counter()
for i in range(reps):
    jax.device_put(host_idx + i).block_until_ready()
t_put = (time.perf_counter() - t0) / reps
print(f"{'packed 1-array chunk fetch':<38s} {t_packed*1e3:8.3f} ms")
print(f"{'legacy 4-array chunk fetch':<38s} {t_four*1e3:8.3f} ms")
print(f"{'one (C,B) int32 device_put':<38s} {t_put*1e3:8.3f} ms")
print(f"{'fetch saving per chunk':<38s} {(t_four-t_packed)*1e3:8.3f} ms "
      f"({C*B} questions/chunk)")

# ---- 3. end-to-end device-pipeline eval epoch (packed drain) ----
_, eval_chunk = make_chunked_steps(model, cfg, opt)
data = {
    "image": batch["image"],  # reuse: index space [0, B)
    "question": batch["question"],
    "answer": batch["answer"],
}
# fake a NVAL-question split by tiling indices over the B real rows
if NVAL % B:
    NVAL = (NVAL // B) * B
    print(f"note: n_val truncated to {NVAL} (multiple of batch size {B})")
nb = NVAL // B
idx = (np.arange(NVAL, dtype=np.int32) % B).reshape(nb, B)
valid = np.ones((nb, B), bool)
cache = None

# warm: compile eval_chunk + prime the fetch path before timing. The last
# chunk may be a remainder shape (nb % C rows) — compile that too, or its
# compile lands inside the timed loop and skews the per-chunk averages.
w = eval_chunk(
    state, jax.device_put(idx[:C]), jax.device_put(valid[:C]), data, cache
)
np.asarray(w)
rem = nb % C
if rem:
    w = eval_chunk(
        state, jax.device_put(idx[:rem]), jax.device_put(valid[:rem]), data, cache
    )
    np.asarray(w)

t0 = time.perf_counter()
pending = None
got = 0
t_puts = t_disp = t_fetch = 0.0
for c0 in range(0, nb, C):
    ta = time.perf_counter()
    ic = jax.device_put(idx[c0 : c0 + C])
    vc = jax.device_put(valid[c0 : c0 + C])
    tb = time.perf_counter()
    outs = eval_chunk(state, ic, vc, data, cache)
    tc = time.perf_counter()
    if pending is not None:
        got += int((np.asarray(pending)[:, :-1] >> 16 & 1).sum())
    td = time.perf_counter()
    t_puts += tb - ta; t_disp += tc - tb; t_fetch += td - tc
    pending = outs
got += int((np.asarray(pending)[:, :-1] >> 16 & 1).sum())
dt = time.perf_counter() - t0
assert got == NVAL, (got, NVAL)
nch = -(-nb // C)  # ceil: the remainder chunk pays the same per-call relay costs
print(f"{'e2e eval epoch (packed drain)':<38s} {dt:8.3f} s   ({NVAL/dt:,.0f} q/s wall)")
print(f"{'wall / device ceiling':<38s} {100*(NVAL/dt)/(B/t_dev):7.1f} %")
print(f"{'  per-chunk idx/valid device_put':<38s} {t_puts/nch*1e3:8.3f} ms")
print(f"{'  per-chunk dispatch (async call)':<38s} {t_disp/nch*1e3:8.3f} ms")
print(f"{'  per-chunk one-behind fetch':<38s} {t_fetch/nch*1e3:8.3f} ms")
print(f"{'  device compute per chunk':<38s} {C*t_dev*1e3:8.3f} ms")

# ---- 4. one-shot epoch: ONE dispatch + ONE fetch (the shipped path) ----
w = eval_chunk(state, jax.device_put(idx), jax.device_put(valid), data, cache)
np.asarray(w)  # compile the nb-step scan + warm
t0 = time.perf_counter()
out = eval_chunk(
    state, jax.device_put(idx), jax.device_put(valid), data, cache
)
got2 = int((np.asarray(out)[:, :-1] >> 16 & 1).sum())
dt2 = time.perf_counter() - t0
assert got2 == NVAL, (got2, NVAL)
print(f"{'e2e eval epoch (one-shot dispatch)':<38s} {dt2:8.3f} s   ({NVAL/dt2:,.0f} q/s wall)")
print(f"{'wall / device ceiling':<38s} {100*(NVAL/dt2)/(B/t_dev):7.1f} %")
