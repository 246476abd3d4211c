"""RelationalLayer: the O(n^2) pairwise g_theta / f_phi core.

Reference parity (SURVEY.md 2.3, reference model.py ~L62-165): all ordered
object pairs -> shared g_theta MLP with the question embedding broadcast and
concatenated at a configurable layer index (question_injection_position; 0 is
the paper, >0 is mesnico's "ir" variants) -> sum-pool over the n^2 pair axis
-> f_phi MLP with dropout before the final layer -> log-softmax over answers.
A `pair_dropout` knob additionally drops a random fraction of pairs per step
(inverted-dropout rescaled) — the "invariance-to-order pair dropout" of
BASELINE.json config #3.

Three numerically-equivalent implementations share one parameter set:
  * 'naive'  — literal pair materialization + concatenation; the test oracle.
  * 'xla'    — TPU-decomposed: because concatenation feeds a linear layer,
      g layer 0 splits into per-object projections u = x@W[:c], v = x@W[c:2c]
      and a per-sample question shift q@W[2c:]; the pair tensor only ever
      exists as (B, n^2, H) activations, and every injection reduces to a
      broadcast-add. XLA fuses the adds into the matmul chain.
  * 'pallas' — fused VMEM-tiled kernel (rnet.kernels.pairwise): streams
      (i, j) object tiles through VMEM and never materializes n^2 rows in
      HBM. Selected automatically for large n on TPU.
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .initializers import torch_bias, torch_linear_kernel


def g_input_dims(
    obj_dim: int, q_dim: int, g_layers: Tuple[int, ...], inject: int
) -> List[int]:
    """Input width of each g layer given the injection position."""
    dims = []
    for l in range(len(g_layers)):
        d = 2 * obj_dim if l == 0 else g_layers[l - 1]
        if l == inject:
            d += q_dim
        dims.append(d)
    return dims


class RelationalLayer(nn.Module):
    obj_dim: int
    q_dim: int
    g_layers: Tuple[int, ...] = (256, 256, 256, 256)
    f_layers: Tuple[int, ...] = (256, 256)
    n_answers: int = 28
    question_injection_position: int = 0
    dropout: float = 0.5
    pair_dropout: float = 0.0
    # 'sum' (reference parity) | 'mean' (pooled / n^2, applied in fp32 after
    # the g impls so all four paths share it; see ModelConfig.pair_pool for
    # why extreme pair counts need it). With object_mask the divisor stays
    # the STATIC n^2 (a constant rescale), not the per-sample valid count.
    pair_pool: str = "sum"
    object_mask: bool = False
    impl: str = "auto"
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        inject = self.question_injection_position
        if not 0 <= inject < len(self.g_layers):
            raise ValueError(
                f"question_injection_position {inject} out of range for "
                f"{len(self.g_layers)} g layers"
            )
        if self.pair_pool not in ("sum", "mean"):
            raise ValueError(
                f"pair_pool must be 'sum' or 'mean', got {self.pair_pool!r}"
            )
        g_in = g_input_dims(self.obj_dim, self.q_dim, self.g_layers, inject)
        self.gw = [
            self.param(f"g{l}_kernel", torch_linear_kernel, (d_in, width))
            for l, (d_in, width) in enumerate(zip(g_in, self.g_layers))
        ]
        self.gb = [
            self.param(f"g{l}_bias", torch_bias(d_in), (width,))
            for l, (d_in, width) in enumerate(zip(g_in, self.g_layers))
        ]
        f_dims = [self.g_layers[-1], *self.f_layers, self.n_answers]
        self.fw = [
            self.param(f"f{l}_kernel", torch_linear_kernel, (d_in, width))
            for l, (d_in, width) in enumerate(zip(f_dims[:-1], f_dims[1:]))
        ]
        self.fb = [
            self.param(f"f{l}_bias", torch_bias(d_in), (width,))
            for l, (d_in, width) in enumerate(zip(f_dims[:-1], f_dims[1:]))
        ]

    # ---- implementation selection ----

    def _resolve_impl(self, n: int) -> str:
        impl = self.impl
        if impl == "auto":
            # pallas pays off when the pair axis is large and widths are
            # uniform (the fused kernel needs equal, MXU-aligned g widths).
            uniform = len(set(self.g_layers)) == 1 and self.g_layers[0] % 128 == 0
            on_tpu = jax.default_backend() == "tpu"
            impl = "pallas" if (n >= 32 and uniform and on_tpu) else "xla"
        return impl

    # ---- g over all pairs: (B, n, c), (B, h) -> (B, n^2, g_out) acts ----

    def _g_naive(self, x, q):
        B, n, c = x.shape
        inject = self.question_injection_position
        xi = jnp.broadcast_to(x[:, :, None, :], (B, n, n, c))  # row i in slot 1
        xj = jnp.broadcast_to(x[:, None, :, :], (B, n, n, c))  # row j in slot 2
        a = jnp.concatenate([xi, xj], -1).reshape(B, n * n, 2 * c)
        for l, (w, b) in enumerate(zip(self.gw, self.gb)):
            if l == inject:
                qb = jnp.broadcast_to(q[:, None, :], (B, n * n, q.shape[-1]))
                a = jnp.concatenate([a, qb.astype(a.dtype)], -1)
            a = jax.nn.relu(a @ w.astype(a.dtype) + b.astype(a.dtype))
        return a

    def _g_xla(self, x, q):
        B, n, c = x.shape
        inject = self.question_injection_position
        dt = x.dtype
        w0 = self.gw[0].astype(dt)
        u = x @ w0[:c]  # (B, n, H0)
        v = x @ w0[c : 2 * c]
        shift0 = self.gb[0].astype(dt)
        if inject == 0:
            shift0 = (shift0 + q @ w0[2 * c :])[:, None, None, :]
        pre = u[:, :, None, :] + v[:, None, :, :] + shift0
        a = jax.nn.relu(pre).reshape(B, n * n, self.g_layers[0])
        from ..parallel.mesh import constrain_pairs

        a = constrain_pairs(a)  # optional 'pairs' mesh-axis sharding
        for l in range(1, len(self.gw)):
            w, b = self.gw[l].astype(dt), self.gb[l].astype(dt)
            if l == inject:
                h_prev = self.g_layers[l - 1]
                a = jax.nn.relu(a @ w[:h_prev] + (q @ w[h_prev:] + b)[:, None, :])
            else:
                a = jax.nn.relu(a @ w + b)
        return a

    def _pool(self, a, pair_dropout_active: bool, pair_mask=None):
        B, n2, _ = a.shape
        if pair_mask is not None:  # exclude pad-object pairs (object_mask)
            a = a * pair_mask[..., None].astype(a.dtype)
        if pair_dropout_active:
            keep = 1.0 - self.pair_dropout
            mask = jax.random.bernoulli(self.make_rng("dropout"), keep, (B, n2))
            a = a * (mask[..., None].astype(a.dtype) / jnp.asarray(keep, a.dtype))
        return a.sum(axis=1)

    # ---- full forward ----

    def __call__(
        self,
        x: jnp.ndarray,  # (B, n, c) objects
        q: jnp.ndarray,  # (B, h) question encoding
        train: bool = False,
        n_objects: jnp.ndarray | None = None,  # (B,) real-object counts
    ) -> jnp.ndarray:
        pair_do = train and self.pair_dropout > 0.0
        impl = self._resolve_impl(x.shape[1])
        use_int8 = impl == "pallas_int8" and not train  # inference-only path
        if impl == "pallas_int8":
            if train and not self.is_initializing():
                import warnings

                # loud fallback (round-3 verdict): the int8 kernel is
                # forward-only; an explicit int8 request during training
                # must not silently train a different numeric path
                warnings.warn(
                    "rl_impl='pallas_int8' is inference-only (no VJP); "
                    "training steps run the bf16 pallas kernel instead",
                    stacklevel=2,
                )
            impl = "pallas"
        pair_mask = None
        if self.object_mask and n_objects is None and not self.is_initializing():
            # fail loudly instead of silently training unmasked: only the
            # state-description datasets carry per-sample object counts
            raise ValueError(
                "object_mask=True but the batch has no n_objects — the mask "
                "needs a state-description dataset (from-pixels grids have "
                "no pad objects to exclude)"
            )
        if self.object_mask and n_objects is not None:
            # keep pair (i, j) iff both are real objects (SURVEY.md 3.4's
            # optional mask; the reference's unmasked behavior is the default)
            B, n = x.shape[0], x.shape[1]
            valid = jnp.arange(n)[None, :] < n_objects[:, None]
            pair_mask = (valid[:, :, None] & valid[:, None, :]).reshape(B, n * n)
            if impl == "pallas":
                raise ValueError(
                    "object_mask needs the naive/xla impl (the fused kernel "
                    "pools in-kernel); SD shapes resolve to xla by default"
                )
        x = x.astype(self.dtype)
        q = q.astype(self.dtype)
        if impl == "naive":
            pooled = self._pool(self._g_naive(x, q), pair_do, pair_mask)
        elif impl == "xla":
            pooled = self._pool(self._g_xla(x, q), pair_do, pair_mask)
        elif impl == "pallas":
            from ..kernels.pairwise import fused_pairwise_g
            from ..parallel.mesh import active_mesh

            seed = None
            if pair_do:  # in-kernel inverted pair dropout
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1, 1), 0, 2**31 - 1, jnp.int32
                )
            pooled = fused_pairwise_g(
                x,
                q,
                list(self.gw),
                list(self.gb),
                inject=self.question_injection_position,
                dtype=self.dtype,
                mesh=active_mesh(),
                pair_keep=1.0 - (self.pair_dropout if pair_do else 0.0),
                seed=seed,
                int8=use_int8,
            )
        else:
            raise ValueError(f"unknown relational impl {impl!r}")

        y = pooled.astype(jnp.float32)
        if self.pair_pool == "mean":
            n = x.shape[1]
            y = y / jnp.float32(n * n)
        for l in range(len(self.fw) - 1):
            y = jax.nn.relu(y @ self.fw[l] + self.fb[l])
        if train and self.dropout > 0.0:
            keep = 1.0 - self.dropout
            mask = jax.random.bernoulli(self.make_rng("dropout"), keep, y.shape)
            y = jnp.where(mask, y / keep, 0.0)
        y = y @ self.fw[-1] + self.fb[-1]
        return jax.nn.log_softmax(y, axis=-1)

    def int8_clip_report(self, x: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
        """(L-1,) per-layer int8 calibration clip fractions on this batch
        (kernels.pairwise.int8_clip_fractions; the pallas_int8 eval
        diagnostic — fractions >> 1e-3 mean the calibration margin is being
        exceeded and int8 accuracy may drift)."""
        from ..kernels.pairwise import pairwise_clip_fractions

        return pairwise_clip_fractions(
            x.astype(self.dtype),
            q.astype(self.dtype),
            list(self.gw),
            list(self.gb),
            inject=self.question_injection_position,
            dtype=self.dtype,
        )

    def g_prefix_features(self, x: jnp.ndarray) -> jnp.ndarray:
        """Question-independent g prefix, sum-pooled over pairs.

        The image-retrieval extraction mode (SURVEY.md 2.7): for "ir" variants
        (injection position p >= 1) the first p g layers never see the
        question; their pair-summed activations are the relational image
        feature. Returns (B, g_layers[p-1]).
        """
        inject = self.question_injection_position
        if inject < 1:
            raise ValueError(
                "extraction needs question_injection_position >= 1 (an 'ir' model)"
            )
        B, n, c = x.shape
        dt = self.dtype
        x = x.astype(dt)
        w0 = self.gw[0].astype(dt)
        u = x @ w0[:c]
        v = x @ w0[c : 2 * c]
        a = jax.nn.relu(
            u[:, :, None, :] + v[:, None, :, :] + self.gb[0].astype(dt)
        ).reshape(B, n * n, self.g_layers[0])
        for l in range(1, inject):
            a = jax.nn.relu(a @ self.gw[l].astype(dt) + self.gb[l].astype(dt))
        return a.sum(axis=1).astype(jnp.float32)
