"""CLEVR dataset readers: from-pixels, state-description, and images-only.

Reference parity (SURVEY.md section 2.5, ``clevr_dataset_connector.py``):
  * ClevrDataset (pixels): questions JSON in memory; per-item PNG decode with
    train-time augmentation (resize->pad->random-crop->small rotation, per the
    paper) or eval resize; tokenized question; answer index.
  * ClevrDatasetStateDescription: objects from scenes JSON as fixed vectors
    (normalized 3-D coords ++ one-hot color/shape/material/size), padded to
    max_objects.
  * ClevrImageDataset: images only, for the feature-extraction path.

These are plain-Python samplers (no torch): the TPU pipeline in pipeline.py
wraps them with threaded decode + fixed-shape numpy batches + device prefetch.
"""

from __future__ import annotations

import json
import os
import random
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from .categories import category_ids
from .vocab import (
    CLEVR_COLORS,
    CLEVR_MATERIALS,
    CLEVR_SHAPES,
    CLEVR_SIZES,
    Dictionaries,
)


class _QuestionCategoriesMixin:
    """Lazy per-question category ids (reference test.py family reporting)."""

    def question_categories(self) -> np.ndarray:
        cached = getattr(self, "_qcat", None)
        if cached is None:
            cached = self._qcat = category_ids(self.questions)
        return cached

# --- image transforms (host side, PIL + numpy) ---


class ImageTransform:
    """Resize(S) [+ Pad(8) + RandomCrop(S) + RandomRotation(+-2.8deg)] -> uint8 HWC.

    Matches the reference's torchvision chain for train/eval (SURVEY.md 2.5);
    the paper's augmentation is pad-and-crop jitter plus ~2.8 degree rotation.
    Output stays uint8; normalization to [0,1] happens on device (3x cheaper
    host->device transfer than fp32).
    """

    def __init__(self, image_size: int, train: bool, pad: int = 8, max_rot_deg: float = 2.8):
        self.size = image_size
        self.train = train
        self.pad = pad
        self.max_rot = max_rot_deg

    def __call__(self, img: Image.Image, rng: Optional[random.Random] = None) -> np.ndarray:
        img = img.convert("RGB").resize((self.size, self.size), Image.BILINEAR)
        if self.train:
            rng = rng or random
            p = self.pad
            arr = np.asarray(img, dtype=np.uint8)
            arr = np.pad(arr, ((p, p), (p, p), (0, 0)), mode="edge")
            x0 = rng.randint(0, 2 * p)
            y0 = rng.randint(0, 2 * p)
            arr = arr[y0 : y0 + self.size, x0 : x0 + self.size]
            if self.max_rot > 0:  # rotation LAST, as in the reference chain
                arr = np.asarray(
                    Image.fromarray(arr).rotate(
                        rng.uniform(-self.max_rot, self.max_rot),
                        resample=Image.BILINEAR,
                    ),
                    dtype=np.uint8,
                )
            return arr
        return np.asarray(img, dtype=np.uint8)


# --- datasets ---


class ClevrDataset(_QuestionCategoriesMixin):
    """From-pixels CLEVR: (image uint8 HWC, question ids, answer idx)."""

    def __init__(
        self,
        clevr_dir: str,
        split: str,
        dictionaries: Dictionaries,
        image_size: int = 128,
        question_max_len: int = 48,
        train_transform: Optional[bool] = None,
        max_rot_deg: float = 2.8,
    ):
        self.clevr_dir = clevr_dir
        self.split = split
        self.dicts = dictionaries
        self.max_len = question_max_len
        qpath = os.path.join(clevr_dir, "questions", f"CLEVR_{split}_questions.json")
        with open(qpath) as f:
            self.questions = json.load(f)["questions"]
        is_train = train_transform if train_transform is not None else (split == "train")
        self.transform = ImageTransform(image_size, train=is_train, max_rot_deg=max_rot_deg)
        self.img_dir = os.path.join(clevr_dir, "images", split)

    def __len__(self) -> int:
        return len(self.questions)

    def __getitem__(self, i: int, rng: Optional[random.Random] = None) -> Dict[str, np.ndarray]:
        q = self.questions[i]
        with Image.open(os.path.join(self.img_dir, q["image_filename"])) as im:
            image = self.transform(im, rng)
        return {
            "image": image,  # (S, S, 3) uint8
            "question": self.dicts.encode_question(q["question"], self.max_len),
            "answer": np.int32(self.dicts.encode_answer(str(q["answer"]).lower())),
        }


def scene_to_objects(objects: List[Dict], max_objects: int, object_dim: int = 18) -> np.ndarray:
    """Scene JSON objects -> (max_objects, 18) float32, zero-padded.

    Layout: [x,y,z]/3 ++ onehot color(8) ++ onehot shape(3) ++ onehot
    material(2) ++ onehot size(2). Coordinates normalized by 3 (CLEVR scene
    coords span ~[-3, 3]). Reference: SURVEY.md 2.5 (order/normalization are
    our choice; exposed here as the single source of truth).
    """
    out = np.zeros((max_objects, object_dim), dtype=np.float32)
    for k, o in enumerate(objects[:max_objects]):
        v = [c / 3.0 for c in o["3d_coords"]]
        v += [1.0 if o["color"] == c else 0.0 for c in CLEVR_COLORS]
        v += [1.0 if o["shape"] == s else 0.0 for s in CLEVR_SHAPES]
        v += [1.0 if o["material"] == m else 0.0 for m in CLEVR_MATERIALS]
        v += [1.0 if o["size"] == s else 0.0 for s in CLEVR_SIZES]
        out[k] = np.asarray(v, dtype=np.float32)
    return out


class ClevrDatasetStateDescription(_QuestionCategoriesMixin):
    """State-description CLEVR: (objects (N,18), n_objects, question, answer).

    Padding objects are zero vectors that DO participate in pairs, matching
    the reference's unmasked behavior (SURVEY.md 3.4); n_objects is carried so
    an optional mask can be applied model-side.
    """

    def __init__(
        self,
        clevr_dir: str,
        split: str,
        dictionaries: Dictionaries,
        max_objects: int = 12,
        object_dim: int = 18,
        question_max_len: int = 48,
    ):
        self.dicts = dictionaries
        self.max_len = question_max_len
        self.max_objects = max_objects
        self.object_dim = object_dim
        with open(os.path.join(clevr_dir, "questions", f"CLEVR_{split}_questions.json")) as f:
            self.questions = json.load(f)["questions"]
        with open(os.path.join(clevr_dir, "scenes", f"CLEVR_{split}_scenes.json")) as f:
            scenes = json.load(f)["scenes"]
        # Pre-vectorize everything once: batch assembly is pure gathers
        # (scene->vector conversion, tokenization, and answer lookup all
        # leave the hot loop).
        obj_by_image = {
            s["image_index"]: scene_to_objects(s["objects"], max_objects, object_dim)
            for s in scenes
        }
        n_by_image = {
            s["image_index"]: min(len(s["objects"]), max_objects) for s in scenes
        }
        self._objects = np.stack(
            [obj_by_image[q["image_index"]] for q in self.questions]
        )
        self._n_objects = np.asarray(
            [n_by_image[q["image_index"]] for q in self.questions], dtype=np.int32
        )
        self._tokens = np.stack(
            [dictionaries.encode_question(q["question"], question_max_len) for q in self.questions]
        )
        self._answers = np.asarray(
            [dictionaries.encode_answer(str(q["answer"]).lower()) for q in self.questions],
            dtype=np.int32,
        )

    def __len__(self) -> int:
        return len(self.questions)

    def get_batch(self, idxs, rng=None) -> Dict[str, np.ndarray]:
        idxs = np.asarray(idxs, dtype=np.int32)
        return {
            "objects": self._objects[idxs],
            "n_objects": self._n_objects[idxs],
            "question": self._tokens[idxs],
            "answer": self._answers[idxs],
        }

    def device_arrays(self) -> Dict[str, np.ndarray]:
        """Per-question arrays for the device-resident pipeline."""
        return {
            "objects": self._objects,
            "n_objects": self._n_objects,
            "question": self._tokens,
            "answer": self._answers,
        }

    def __getitem__(self, i: int, rng: Optional[random.Random] = None) -> Dict[str, np.ndarray]:
        return {
            "objects": self._objects[i],
            "n_objects": np.int32(self._n_objects[i]),
            "question": self._tokens[i],
            "answer": np.int32(self._answers[i]),
        }


class ClevrImageDataset:
    """Images only (eval transform); used by the extraction CLI."""

    def __init__(self, clevr_dir: str, split: str, image_size: int = 128):
        self.img_dir = os.path.join(clevr_dir, "images", split)
        self.files = sorted(
            f for f in os.listdir(self.img_dir) if f.endswith(".png")
        )
        self.transform = ImageTransform(image_size, train=False)

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, i: int, rng: Optional[random.Random] = None) -> Dict[str, np.ndarray]:
        with Image.open(os.path.join(self.img_dir, self.files[i])) as im:
            return {"image": self.transform(im), "index": np.int32(i)}
