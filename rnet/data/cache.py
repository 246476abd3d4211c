"""Decoded-image cache: decode CLEVR PNGs once, serve batches as memcpy.

The reference pays a PIL decode + resize per __getitem__ in DataLoader worker
processes (SURVEY.md 2.5/2.8) — at TPU training rates (tens of thousands of
questions/sec) per-item decode can never keep up. TPU-native pipeline:

  1. one-time pass decodes + resizes every image of a split into a packed
     uint8 memmap (`<clevr>/rnet_cache/<split>_<S>.u8`), padded by `pad`
     pixels (edge-replicated) so train-time crop jitter is pure slicing;
  2. `CachedClevrDataset` serves items by memmap slice — no decode, no PIL;
     random crop happens host-side as a numpy view copy; the small random
     rotation runs on device (rnet/data/augment.py), fused into the step.
"""

from __future__ import annotations

import json
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import numpy as np
from PIL import Image

from .clevr import _QuestionCategoriesMixin
from .vocab import Dictionaries


def _cache_paths(clevr_dir: str, split: str, size: int, pad: int):
    d = os.path.join(clevr_dir, "rnet_cache")
    base = f"{split}_{size}p{pad}"
    return os.path.join(d, base + ".u8"), os.path.join(d, base + ".json")


def build_image_cache(
    clevr_dir: str, split: str, image_size: int = 128, pad: int = 8, threads: int = 16
) -> str:
    """Decode every PNG of a split into a packed (N, S+2p, S+2p, 3) memmap."""
    arr_path, meta_path = _cache_paths(clevr_dir, split, image_size, pad)
    if os.path.exists(arr_path) and os.path.exists(meta_path):
        return arr_path
    img_dir = os.path.join(clevr_dir, "images", split)
    files = sorted(f for f in os.listdir(img_dir) if f.endswith(".png"))
    S = image_size + 2 * pad
    os.makedirs(os.path.dirname(arr_path), exist_ok=True)
    mm = np.lib.format.open_memmap(
        arr_path + ".tmp", mode="w+", dtype=np.uint8, shape=(len(files), S, S, 3)
    )

    def decode(i):
        with Image.open(os.path.join(img_dir, files[i])) as im:
            a = np.asarray(
                im.convert("RGB").resize((image_size, image_size), Image.BILINEAR),
                dtype=np.uint8,
            )
        mm[i] = np.pad(a, ((pad, pad), (pad, pad), (0, 0)), mode="edge")

    with ThreadPoolExecutor(threads) as pool:
        list(pool.map(decode, range(len(files))))
    mm.flush()
    del mm
    os.replace(arr_path + ".tmp", arr_path)
    with open(meta_path, "w") as f:
        json.dump(
            {"files": files, "image_size": image_size, "pad": pad, "n": len(files)}, f
        )
    return arr_path


class CachedClevrDataset(_QuestionCategoriesMixin):
    """From-pixels CLEVR served from the decoded cache.

    Two serving modes:
      * per-item (``__getitem__``): PADDED image cropped host-side (train
        jitter / eval center crop == plain resize).
      * vectorized (``get_batch``, used automatically by BatchIterator):
        questions/answers are pre-tokenized into packed arrays at init and a
        whole batch is assembled with two fancy-index gathers; with
        ``serve_padded=True`` the images ship PADDED and the random crop runs
        on device fused with the rotation (rnet/data/augment.py) — this is
        what lets the host keep up with the chip (the per-item path tops out
        around 1.2k questions/s vs the device's ~25k).
    """

    def __init__(
        self,
        clevr_dir: str,
        split: str,
        dictionaries: Dictionaries,
        image_size: int = 128,
        question_max_len: int = 48,
        train_transform: Optional[bool] = None,
        pad: int = 8,
        serve_padded: bool = False,
        serve_indices: bool = False,
    ):
        self.dicts = dictionaries
        self.max_len = question_max_len
        self.size = image_size
        self.pad = pad
        self.train = train_transform if train_transform is not None else (split == "train")
        self.serve_padded = serve_padded
        self.serve_indices = serve_indices
        arr_path, meta_path = _cache_paths(clevr_dir, split, image_size, pad)
        if not os.path.exists(arr_path):
            build_image_cache(clevr_dir, split, image_size, pad)
        self.images = np.load(arr_path, mmap_mode="r")
        with open(meta_path) as f:
            meta = json.load(f)
        self.file_to_idx = {f: i for i, f in enumerate(meta["files"])}
        with open(os.path.join(clevr_dir, "questions", f"CLEVR_{split}_questions.json")) as f:
            self.questions = json.load(f)["questions"]
        # pre-tokenize once: the regex tokenizer leaves the hot loop entirely
        self._tokens = np.stack(
            [self.dicts.encode_question(q["question"], self.max_len) for q in self.questions]
        )
        self._answers = np.asarray(
            [self.dicts.encode_answer(str(q["answer"]).lower()) for q in self.questions],
            dtype=np.int32,
        )
        self._img_idx = np.asarray(
            [self.file_to_idx[q["image_filename"]] for q in self.questions],
            dtype=np.int32,
        )

    def __len__(self) -> int:
        return len(self.questions)

    def device_arrays(self):
        """Per-question arrays for the device-resident pipeline (+ .images)."""
        if not self.serve_indices:
            return None
        return {
            "question": self._tokens,
            "answer": self._answers,
            "image_idx": self._img_idx,
        }

    def get_batch(self, idxs, rng=None):
        """Vectorized batch assembly: two gathers + (optionally) host crops.

        serve_indices mode ships NO pixels at all — only the per-question
        image index; the image gather + crop happen on device against the
        HBM-resident cache (see Trainer's device pipeline / steps.py).
        """
        idxs = np.asarray(idxs, dtype=np.int32)
        if self.serve_indices:
            return {
                "image_idx": self._img_idx[idxs],
                "question": self._tokens[idxs],
                "answer": self._answers[idxs],
            }
        imgs = self.images[self._img_idx[idxs]]  # (B, S+2p, S+2p, 3) one gather
        p, S = self.pad, self.size
        if not self.serve_padded:
            out = np.empty((len(idxs), S, S, 3), np.uint8)
            for k in range(len(idxs)):
                if self.train and rng is not None:
                    x0, y0 = rng.randint(0, 2 * p), rng.randint(0, 2 * p)
                else:
                    x0 = y0 = p
                out[k] = imgs[k, y0 : y0 + S, x0 : x0 + S]
            imgs = out
        return {
            "image": np.ascontiguousarray(imgs),
            "question": self._tokens[idxs],
            "answer": self._answers[idxs],
        }

    def __getitem__(self, i: int, rng=None):
        b = self.get_batch([i], rng)
        return {k: v[0] for k, v in b.items()}
