"""Micro-batched inference serving for trained RN checkpoints.

The reference repo stops at test.py (batch evaluation of a whole split);
deployment-style serving — answer arbitrary questions about arbitrary
images/scenes, one or a few at a time, at low latency — is the TPU-native
extension the serving-latency sweep (RESULTS.md) measured the envelope for:
one original-fp question costs 55 us of chip time at B=1, and batching to
~32-64 reaches within ~3% of peak per-question efficiency. This module is
the thin host loop around that envelope:

- a BUCKET LADDER of compiled shapes (default 1 / 8 / max_batch): each
  micro-batch routes to the smallest compiled bucket that fits, so an
  interactive B=1 request pays B=1 compute (55 us chip time on
  original-fp) instead of max_batch's — jit caches one program per shape;
- short request batches are padded (by repetition) only up to their
  bucket and sliced after;
- PER-REQUEST error isolation: a bad request (missing/non-string fields,
  unreadable image file, out-of-vocabulary word under oov='error', bad
  scene objects) yields an ``{"error": ...}`` result in its slot and the
  other requests in the batch are served normally — one poisoned request
  must never take the server down. Served-OOV policy: ``--oov error``
  (the default; reference ``to_dictionary_indexes`` semantics) rejects
  that one request with an error naming the word; ``--oov unk``/``drop``
  serve unknown words through the respective policy;
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


class ServeError(ValueError):
    """A single request is unservable; the message is the client-facing
    explanation. Raised by encode() and isolated per-request by answer()."""


def _default_buckets(max_batch: int) -> tuple:
    """1 / 8 / max_batch, deduped and clipped — the serving-latency sweep's
    envelope points (RESULTS.md: B=1 interactive, B>=8 near-saturation)."""
    return tuple(sorted({b for b in (1, 8, max_batch) if b <= max_batch}))


class InferenceServer:
    """Compile-per-bucket, micro-batched RN inference.

    `max_batch` caps a micro-batch; each chunk routes to the smallest
    compiled bucket shape that fits (jit caches one program per shape).
    Answers are returned as strings through the carried answer map; bad
    requests return ``{"error": ...}`` in their slot.
    """

    def __init__(
        self,
        cfg: ModelConfig,
        dicts: Dictionaries,
        *,
        invert: bool = True,
        max_batch: int = 64,
        buckets: Optional[Sequence[int]] = None,
    ):
        self.cfg = cfg
        self.dicts = dicts
        self.invert = invert
        self.max_batch = int(max_batch)
        if buckets is None:
            self.buckets = _default_buckets(self.max_batch)
        else:
            bs = sorted({int(b) for b in buckets if 0 < int(b) <= self.max_batch})
            self.buckets = tuple(bs) if bs else (self.max_batch,)
            if self.buckets[-1] != self.max_batch:
                self.buckets = self.buckets + (self.max_batch,)
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

    def _dummy_batch(self, batch: Optional[int] = None) -> Dict[str, jnp.ndarray]:
        B, cfg = batch or self.max_batch, self.cfg
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
        """One request -> model-ready sample, or ServeError with a
        client-facing message (answer() isolates it to the one request).

        from-pixels: {"image": <png path>, "question": str}
        state-description: {"objects": [scene objects...], "question": str}
        """
        if not isinstance(request, dict):
            raise ServeError(
                f"request must be a JSON object, got {type(request).__name__}"
            )
        question = request.get("question")
        if not isinstance(question, str) or not question.strip():
            raise ServeError("missing or empty 'question' field (string required)")
        try:
            q = self.dicts.encode_question(question, self.cfg.question_max_len)
        except KeyError as e:
            raise ServeError(
                f"out-of-vocabulary question word {e.args[0]!r} rejected under "
                "oov='error' (reference tokenizer semantics); restart with "
                "--oov unk or --oov drop to serve unknown words"
            ) from None
        if not q.any():
            # oov='drop' can strip EVERY token; an all-pad question would
            # silently answer from the image prior alone — reject instead
            raise ServeError(
                "question has no in-vocabulary words after tokenization"
            )
        out = {"question": q}
        if self.cfg.state_description:
            objects = request.get("objects")
            if not isinstance(objects, list) or not objects:
                raise ServeError(
                    "missing or empty 'objects' list (state-description model)"
                )
            try:
                out["objects"] = scene_to_objects(
                    objects, self.cfg.max_objects, self.cfg.object_dim
                )
            except Exception as e:
                raise ServeError(f"bad scene objects: {e}") from None
        else:
            path = request.get("image")
            if not isinstance(path, str):
                raise ServeError(
                    "missing or non-string 'image' field (from-pixels model)"
                )
            from PIL import Image

            try:
                with Image.open(path) as im:
                    out["image"] = self._transform(im)
            except FileNotFoundError:
                raise ServeError(f"image file not found: {path!r}") from None
            except Exception as e:
                raise ServeError(f"cannot read image {path!r}: {e}") from None
        return out

    # ---- serving ----

    def warmup(self) -> None:
        """Compile the predict program for every bucket shape up front,
        so the first real request at any batch size pays no compile."""
        if self.params is None:
            raise RuntimeError("load() a checkpoint before serving")
        for bucket in self.buckets:
            b = self._dummy_batch(bucket)
            inputs = b["objects"] if self.cfg.state_description else b["image"]
            pred, _ = self._predict(
                self.params, self.batch_stats, inputs, b["question"]
            )
            np.asarray(pred)

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        return self.max_batch

    def answer(self, requests: Sequence[Dict]) -> List[Dict]:
        """Micro-batch of requests -> one result dict per request, in order:
        {"answer", "log_prob", "latency_ms", "batch", "bucket"} on success,
        {"error": <client-facing message>} for the requests that failed to
        encode — the rest of the batch is served normally.

        Each valid chunk (up to max_batch) pads (by repeating the last row,
        sliced off after) only to the smallest compiled bucket that fits.
        """
        if self.params is None:
            raise RuntimeError("load() a checkpoint before serving")
        results: List[Optional[Dict]] = [None] * len(requests)
        valid: List[tuple] = []  # (original index, encoded sample)
        for i, r in enumerate(requests):
            try:
                valid.append((i, self.encode(r)))
            except ServeError as e:
                results[i] = {"error": str(e)}
            except Exception as e:  # isolation backstop: no request may crash us
                results[i] = {"error": f"{type(e).__name__}: {e}"}
        for c0 in range(0, len(valid), self.max_batch):
            chunk = valid[c0 : c0 + self.max_batch]
            n = len(chunk)
            bucket = self._bucket_for(n)
            samples = [s for _, s in chunk] + [chunk[-1][1]] * (bucket - n)
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
            for k, (i, _) in enumerate(chunk):
                results[i] = {
                    "answer": self._idx_to_answer[int(pred[k])],
                    "log_prob": float(logp[k]),
                    "latency_ms": ms,
                    "batch": n,
                    "bucket": bucket,
                }
        return results
