#!/usr/bin/env python
"""Per-component forward benchmarks: conv / LSTM / full RN (run on TPU)."""
import sys; sys.path.insert(0, ".")
from functools import partial
import jax, jax.numpy as jnp, numpy as np
from rnet.config import load_config
from rnet.models import RN
from rnet.models.conv import ConvInputModel
from rnet.models.text import QuestionEmbedModel
from rnet.utils.timing import device_loop_time

B = 512
cfg = load_config('original-fp', overrides={'rl_impl':'auto'})

def loop_of(apply_fn, x0, perturb):
    @partial(jax.jit, static_argnums=(1,))
    def loop(x, K):
        def body(i, carry):
            xc, acc = carry
            out = apply_fn(xc)
            xc = perturb(xc, out)
            return (xc, acc + out.sum().astype(jnp.float32))
        _, acc = jax.lax.fori_loop(0, K, body, (x, jnp.float32(0)))
        return acc
    return loop

# conv
conv = ConvInputModel(dtype=jnp.bfloat16)
img = jax.random.normal(jax.random.key(0), (B,128,128,3), jnp.bfloat16)
cp = conv.init(jax.random.key(0), img, train=False)
f = lambda x: conv.apply(cp, x, train=False)
lp = loop_of(f, img, lambda x, o: x + (o.sum()*0.0).astype(x.dtype))
t = device_loop_time(lambda K: (lambda: lp(img, K)))
print(f'conv fwd B={B}: {t*1e3:.2f} ms')

# lstm
text = QuestionEmbedModel(vocab_size=90, emb_dim=32, hidden=128)
tok = jax.random.randint(jax.random.key(0), (B,48), 1, 80, jnp.int32)
tp = text.init(jax.random.key(0), tok)
emb = tp['params']['embedding']
def ftext(e):
    p2 = {'params': {**tp['params'], 'embedding': e}}
    return text.apply(p2, tok)
lp2 = loop_of(ftext, emb, lambda e, o: e + (o.sum()*0.0).astype(e.dtype))
t2 = device_loop_time(lambda K: (lambda: lp2(emb, K)))
print(f'lstm fwd B={B}: {t2*1e3:.2f} ms')

# full RN fwd
model = RN(cfg=cfg, vocab_size=90)
img8 = jax.random.randint(jax.random.key(0), (B,128,128,3), 0, 255, jnp.int32).astype(jnp.uint8)
params = model.init(jax.random.key(0), img8, tok, train=False)
emb2 = params['params']['text']['embedding']
def frn(e):
    import flax
    p = flax.core.copy(params, {})
    p['params']['text']['embedding'] = e
    return model.apply(p, img8, tok, train=False)
lp3 = loop_of(frn, emb2, lambda e, o: e + (o.sum()*0.0).astype(e.dtype))
t3 = device_loop_time(lambda K: (lambda: lp3(emb2, K)))
print(f'full RN fwd B={B}: {t3*1e3:.2f} ms')
