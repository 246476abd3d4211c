"""Micro-batched inference serving for trained RN checkpoints.

The reference repo stops at test.py (batch evaluation of a whole split);
deployment-style serving — answer arbitrary questions about arbitrary
images/scenes, one or a few at a time, at low latency — is the TPU-native
extension the serving-latency sweep (RESULTS.md) measured the envelope for:
one original-fp question costs 55 us of chip time at B=1, and batching to
~32-64 reaches within ~3% of peak per-question efficiency. This module is
the thin host loop around that envelope:

- ONE compiled program at a fixed max batch size (static shapes; jit'd
  predict over params/batch_stats);
- short request batches are padded by repetition and sliced after;
- dictionaries come carried by the checkpoint (round-4 sidecar/pkl
  convention), so serving never depends on the training data dir;
- both data paths (from-pixels images and state-description scenes) serve
  through the same entry.

Reference behaviors reproduced: eval transform (SURVEY.md 2.5 — resize
only), question tokenization/inversion (2.2/2.6), log-softmax answer head
(2.3); the answer string decodes through the training-time answer map.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelConfig
from .data.clevr import ImageTransform, scene_to_objects
from .data.vocab import Dictionaries, invert_questions
from .models import RN


class InferenceServer:
    """Compile-once, micro-batched RN inference.

    `max_batch` fixes the compiled batch shape; requests beyond it are
    served in successive chunks. Answers are returned as strings through
    the carried answer map.
    """

    def __init__(
        self,
        cfg: ModelConfig,
        dicts: Dictionaries,
        *,
        invert: bool = True,
        max_batch: int = 64,
    ):
        self.cfg = cfg
        self.dicts = dicts
        self.invert = invert
        self.max_batch = int(max_batch)
        self.model = RN(cfg=cfg, vocab_size=dicts.vocab_size)
        self._idx_to_answer = {i: a for a, i in dicts.answer_to_idx.items()}
        self._transform = ImageTransform(cfg.image_size, train=False)
        self.params = None
        self.batch_stats = None

        @partial(jax.jit, static_argnums=())
        def _predict(params, batch_stats, inputs, question):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            logp = self.model.apply(variables, inputs, question, train=False)
            best = logp.argmax(-1)
            return best, jnp.take_along_axis(logp, best[:, None], axis=-1)[:, 0]

        self._predict = _predict

    # ---- weights ----

    def load(self, checkpoint: str, checkpoint_dir: Optional[str] = None) -> None:
        """Restore weights from a pkl export or an orbax epoch dir/number,
        validated against this config's skeleton (topology guard)."""
        from .train.checkpoint import CheckpointManager, import_weights
        from .train.loop import make_injected_optimizer
        from .train.steps import create_train_state

        state = create_train_state(
            self.model,
            self.cfg,
            make_injected_optimizer(1e-4, clip_norm=50.0),
            jax.random.key(0),
            self._dummy_batch(),
        )
        ck = str(checkpoint)
        if ck.endswith(".pkl"):
            state = import_weights(state, ck)
        else:
            import os

            mgr = CheckpointManager(
                checkpoint_dir or os.path.dirname(os.path.abspath(ck)),
                self.cfg.name,
            )
            state = mgr.restore_weights(
                state, int(ck) if ck.isdigit() else ck
            )
        self.params = state.params
        self.batch_stats = state.batch_stats

    def _dummy_batch(self) -> Dict[str, jnp.ndarray]:
        B, cfg = self.max_batch, self.cfg
        batch = {
            "question": jnp.ones((B, cfg.question_max_len), jnp.int32),
            "answer": jnp.zeros((B,), jnp.int32),
        }
        if cfg.state_description:
            batch["objects"] = jnp.zeros(
                (B, cfg.max_objects, cfg.object_dim), jnp.float32
            )
        else:
            batch["image"] = jnp.zeros(
                (B, cfg.image_size, cfg.image_size, 3), jnp.uint8
            )
        return batch

    # ---- request encoding ----

    def encode(self, request: Dict) -> Dict[str, np.ndarray]:
        """One request -> model-ready sample.

        from-pixels: {"image": <png path>, "question": str}
        state-description: {"objects": [scene objects...], "question": str}
        """
        out = {
            "question": self.dicts.encode_question(
                request["question"], self.cfg.question_max_len
            )
        }
        if self.cfg.state_description:
            out["objects"] = scene_to_objects(
                request["objects"], self.cfg.max_objects, self.cfg.object_dim
            )
        else:
            from PIL import Image

            with Image.open(request["image"]) as im:
                out["image"] = self._transform(im)
        return out

    # ---- serving ----

    def warmup(self) -> None:
        """Compile the predict program before the first real request."""
        if self.params is None:
            raise RuntimeError("load() a checkpoint before serving")
        b = self._dummy_batch()
        inputs = b["objects"] if self.cfg.state_description else b["image"]
        pred, _ = self._predict(self.params, self.batch_stats, inputs, b["question"])
        np.asarray(pred)

    def answer(self, requests: Sequence[Dict]) -> List[Dict]:
        """Micro-batch of requests -> [{"answer", "log_prob", "latency_ms"}].

        The compiled shape is (max_batch, ...): short batches pad by
        repeating the last row (sliced off after), long ones chunk.
        """
        if self.params is None:
            raise RuntimeError("load() a checkpoint before serving")
        results: List[Dict] = []
        for c0 in range(0, len(requests), self.max_batch):
            chunk = list(requests[c0 : c0 + self.max_batch])
            n = len(chunk)
            samples = [self.encode(r) for r in chunk]
            pad = self.max_batch - n
            samples += [samples[-1]] * pad
            q = np.stack([s["question"] for s in samples])
            if self.invert:
                q = invert_questions(q)
            key = "objects" if self.cfg.state_description else "image"
            inputs = np.stack([s[key] for s in samples])
            t0 = time.perf_counter()
            pred, logp = self._predict(
                self.params, self.batch_stats, jnp.asarray(inputs), jnp.asarray(q)
            )
            pred, logp = np.asarray(pred), np.asarray(logp)
            ms = (time.perf_counter() - t0) * 1e3
            results += [
                {
                    "answer": self._idx_to_answer[int(pred[i])],
                    "log_prob": float(logp[i]),
                    "latency_ms": ms,
                    "batch": n,
                }
                for i in range(n)
            ]
        return results
