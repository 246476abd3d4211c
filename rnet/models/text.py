"""QuestionEmbedModel: word embedding + mask-aware LSTM question encoder.

Reference parity (SURVEY.md 2.2, reference model.py ~L37-60):
nn.Embedding(vocab, emb, padding_idx=0) -> nn.LSTM(emb, hidden) -> final
hidden state. TPU-native: the recurrence is a `jax.lax.scan` over a fixed
question_max_len (static shapes for jit), and the cell is mask-aware — pad
steps carry state through unchanged, so the encoding equals the hidden state
at the last real token regardless of padding length or question inversion.
(Deviation note: the reference runs the LSTM over pad steps too; with its
default question inversion pads precede the tokens, which our masked carry
reproduces up to the pad-step bias drift. Accuracy-parity, not bit-parity.)

Gate order matches torch (i, f, g, o) so oracle weight transplant is direct.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .initializers import embedding_normal, lstm_uniform


class QuestionEmbedModel(nn.Module):
    vocab_size: int
    emb_dim: int = 32
    hidden: int = 128
    dtype: jnp.dtype = jnp.float32  # small; fp32 keeps the recurrence stable
    # False = reference behavior: the recurrence also runs over pad steps
    # (zero inputs from padding_idx=0; the gate biases drift the state).
    # With inverted questions pads lead, so this reproduces the reference's
    # leading pad-bias drift exactly (A/B knob; see config.lstm_mask_pads).
    mask_pads: bool = True

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """(B, T) int32 (0 = pad) -> (B, hidden)."""
        B, T = tokens.shape
        H = self.hidden
        table = self.param(
            "embedding", embedding_normal, (self.vocab_size, self.emb_dim)
        )
        mask = (tokens != 0).astype(self.dtype)  # (B, T)
        # padding_idx=0 semantics: pad rows contribute zero vectors.
        x = table[tokens].astype(self.dtype) * mask[..., None]  # (B, T, E)

        init = lstm_uniform(H)
        wx = self.param("wx", init, (self.emb_dim, 4 * H))
        wh = self.param("wh", init, (H, 4 * H))
        b = self.param("b", init, (4 * H,))

        # Hoist the input projection out of the recurrence: one (B*T, E)@(E,4H)
        # MXU matmul instead of T tiny ones inside the scan. Only the h @ Wh
        # recurrence stays sequential.
        xg = (x.reshape(B * T, -1) @ wx + b).reshape(B, T, 4 * H)

        def step(carry, xg_mt):
            h, c = carry
            xgt, mt = xg_mt  # (B, 4H), (B, 1)
            gates = xgt + h @ wh
            i, f, g, o = jnp.split(gates, 4, axis=-1)  # torch gate order
            c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            if self.mask_pads:
                h = jnp.where(mt > 0, h_new, h)
                c = jnp.where(mt > 0, c_new, c)
            else:  # reference: pad steps update state too (bias drift)
                h, c = h_new, c_new
            return (h, c), None

        h0 = jnp.zeros((B, H), self.dtype)
        # Full unroll: measured 0.485 ms fwd+bwd at B=512/T=48 vs 1.175 ms at
        # unroll=8 and 1.946 ms at unroll=16 (v5e, round 3) — with the loop
        # gone XLA schedules all T recurrence steps' VPU work back to back.
        # T is a small static config value (question_max_len), so full unroll
        # costs only compile time; the math is identical to any unroll.
        (h, _), _ = jax.lax.scan(
            step,
            (h0, h0),
            (xg.transpose(1, 0, 2), mask.T[..., None]),
            unroll=T,
        )
        return h
