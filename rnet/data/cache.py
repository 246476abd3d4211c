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


class CachedClevrDataset:
    """From-pixels CLEVR served from the decoded cache.

    Items carry the PADDED image; crop jitter (train) is a host-side numpy
    slice; rotation is left to the on-device augmenter. Eval items are the
    center crop (== plain resize, matching the reference's eval transform).
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
    ):
        self.dicts = dictionaries
        self.max_len = question_max_len
        self.size = image_size
        self.pad = pad
        self.train = train_transform if train_transform is not None else (split == "train")
        arr_path, meta_path = _cache_paths(clevr_dir, split, image_size, pad)
        if not os.path.exists(arr_path):
            build_image_cache(clevr_dir, split, image_size, pad)
        self.images = np.load(arr_path, mmap_mode="r")
        with open(meta_path) as f:
            meta = json.load(f)
        self.file_to_idx = {f: i for i, f in enumerate(meta["files"])}
        with open(os.path.join(clevr_dir, "questions", f"CLEVR_{split}_questions.json")) as f:
            self.questions = json.load(f)["questions"]

    def __len__(self) -> int:
        return len(self.questions)

    def __getitem__(self, i: int, rng=None):
        q = self.questions[i]
        img = self.images[self.file_to_idx[q["image_filename"]]]
        p, S = self.pad, self.size
        if self.train and rng is not None:
            x0, y0 = rng.randint(0, 2 * p), rng.randint(0, 2 * p)
        else:
            x0 = y0 = p  # center crop == eval resize
        image = np.ascontiguousarray(img[y0 : y0 + S, x0 : x0 + S])
        return {
            "image": image,
            "question": self.dicts.encode_question(q["question"], self.max_len),
            "answer": np.int32(self.dicts.encode_answer(str(q["answer"]).lower())),
        }
