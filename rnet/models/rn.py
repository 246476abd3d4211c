"""RN: the composition root (from-pixels / state-description switch).

Reference parity (SURVEY.md 2.4, reference model.py ~L167-240):
  * from-pixels: ConvInputModel -> (B, g, g, C) -> (B, g^2, C) objects, each
    tagged with its 2-D grid coordinate (a cached constant tensor; here
    linspace(-1, 1, g) per axis) -> RelationalLayer with the LSTM question.
  * state-description: objects arrive pre-vectorized from the dataset; no CNN,
    no coordinate append (coords are already in the object vector).
Outputs log-probs over the answer vocabulary; loss is NLL.

Extraction mode (SURVEY.md 2.7): `apply(..., method=RN.extract)` returns the
question-independent g-prefix relational features for image retrieval.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..config import ModelConfig
from .conv import ConvInputModel
from .relational import RelationalLayer
from .text import QuestionEmbedModel


def grid_coords(g: int, dtype=jnp.float32) -> jnp.ndarray:
    """(g*g, 2) coordinate tags in [-1, 1], row-major [(cx, cy)] order."""
    lin = jnp.linspace(-1.0, 1.0, g, dtype=dtype)
    cy, cx = jnp.meshgrid(lin, lin, indexing="ij")  # cy varies over rows
    return jnp.stack([cx.reshape(-1), cy.reshape(-1)], axis=-1)


class RN(nn.Module):
    cfg: ModelConfig
    vocab_size: int

    def setup(self):
        cfg = self.cfg
        dt = jnp.dtype(cfg.compute_dtype)
        if not cfg.state_description:
            self.conv = ConvInputModel(
                channels=cfg.conv_channels,
                kernel=cfg.conv_kernel,
                stride=cfg.conv_stride,
                dtype=dt,
            )
        self.text = QuestionEmbedModel(
            vocab_size=self.vocab_size,
            emb_dim=cfg.lstm_word_emb,
            hidden=cfg.lstm_hidden,
            mask_pads=cfg.lstm_mask_pads,
        )
        self.relational = RelationalLayer(
            obj_dim=cfg.obj_feat_dim,
            q_dim=cfg.lstm_hidden,
            g_layers=cfg.g_layers,
            f_layers=cfg.f_layers,
            n_answers=cfg.n_answers,
            question_injection_position=cfg.question_injection_position,
            dropout=cfg.dropout,
            pair_dropout=cfg.pair_dropout,
            pair_pool=cfg.pair_pool,
            object_mask=cfg.object_mask,
            impl=cfg.rl_impl,
            dtype=dt,
        )

    def _objects(
        self, inputs: jnp.ndarray, train: bool, augmented: bool = False
    ) -> jnp.ndarray:
        cfg = self.cfg
        if cfg.state_description:
            return inputs  # (B, n, object_dim) from the dataset
        x = inputs
        if augmented:
            # crop/rotate/normalize already fused into the input pipeline
            # (rnet/kernels/augment.py via train_step); straight to the conv.
            return self._grid_objects(x, train)
        if x.shape[1] > cfg.image_size:
            # padded images from the cached pipeline: crop on device (random
            # jitter in training, center crop == plain resize at eval)
            from ..data.augment import center_crop_batch, random_crop_batch

            if train and cfg.device_augment:
                x = random_crop_batch(x, self.make_rng("dropout"), cfg.image_size)
            else:
                x = center_crop_batch(x, cfg.image_size)
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.dtype(cfg.compute_dtype)) / 255.0
        if train and cfg.device_augment:
            from ..data.augment import random_rotate_batch

            # rotation runs in the compute dtype: the shear weights are exact
            # in bf16 to ~3 decimal digits, plenty for [0,1] pixel data, and
            # the rolls are memory-bound (half the traffic vs fp32)
            x = random_rotate_batch(x, self.make_rng("dropout"))
        return self._grid_objects(x, train)

    def _grid_objects(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        feats = self.conv(x, train=train)  # (B, g, g, C)
        B, g, _, C = feats.shape
        objs = feats.reshape(B, g * g, C)
        coords = grid_coords(g, dtype=objs.dtype)
        coords = jnp.broadcast_to(coords[None], (B, g * g, 2))
        return jnp.concatenate([objs, coords], axis=-1)

    def __call__(
        self,
        inputs: jnp.ndarray,  # (B,S,S,3) image or (B,n,obj_dim) objects
        question: jnp.ndarray,  # (B, T) int32 token ids
        train: bool = False,
        augmented: bool = False,  # inputs already crop/rotate/normalized
        n_objects: jnp.ndarray | None = None,  # (B,) SD real-object counts
    ) -> jnp.ndarray:
        objects = self._objects(inputs, train, augmented)
        q = self.text(question)
        return self.relational(objects, q, train=train, n_objects=n_objects)

    def extract(self, inputs: jnp.ndarray) -> jnp.ndarray:
        """g-prefix relational features for image retrieval (ir-* models)."""
        objects = self._objects(inputs, train=False)
        return self.relational.g_prefix_features(objects)

    def int8_clip_report(
        self, inputs: jnp.ndarray, question: jnp.ndarray
    ) -> jnp.ndarray:
        """(L-1,) int8 calibration clip fractions on a live batch (the
        pallas_int8 drift diagnostic; see RelationalLayer.int8_clip_report)."""
        objects = self._objects(inputs, train=False)
        q = self.text(question)
        return self.relational.int8_clip_report(objects, q)
