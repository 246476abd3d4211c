"""Synthetic CLEVR-shaped fixture generator.

The container has no network egress, so tests and overfit runs use a miniature
dataset with the real CLEVR directory schema (SURVEY.md section 4 item 4):

    <root>/images/{train,val}/CLEVR_{split}_{idx:06d}.png
    <root>/questions/CLEVR_{split}_questions.json
    <root>/scenes/CLEVR_{split}_scenes.json

Scenes are rendered as flat 2-D sprites (color/shape/size/material are all
visually encoded), and questions are template-generated WITH correct answers
computed from the scene — so models can genuinely learn/overfit on fixtures.
"""

from __future__ import annotations

import json
import os
import random
from typing import Dict, List, Tuple

from PIL import Image, ImageDraw

from .vocab import (
    CLEVR_COLORS,
    CLEVR_MATERIALS,
    CLEVR_SHAPES,
    CLEVR_SIZES,
)

_RGB = {
    "gray": (87, 87, 87),
    "red": (173, 35, 35),
    "blue": (42, 75, 215),
    "green": (29, 105, 20),
    "brown": (129, 74, 25),
    "purple": (129, 38, 192),
    "cyan": (41, 208, 208),
    "yellow": (255, 238, 51),
}


def _draw_object(draw: ImageDraw.ImageDraw, obj: Dict, W: int, H: int) -> None:
    cx = (obj["3d_coords"][0] / 3.0 * 0.4 + 0.5) * W
    cy = (obj["3d_coords"][1] / 3.0 * 0.4 + 0.5) * H
    r = (0.055 if obj["size"] == "small" else 0.10) * min(W, H)
    color = _RGB[obj["color"]]
    # "metal" renders with a white specular outline; "rubber" is matte.
    outline = (255, 255, 255) if obj["material"] == "metal" else None
    box = (cx - r, cy - r, cx + r, cy + r)
    if obj["shape"] == "sphere":
        draw.ellipse(box, fill=color, outline=outline, width=2)
    elif obj["shape"] == "cube":
        draw.rectangle(box, fill=color, outline=outline, width=2)
    else:  # cylinder -> vertical capsule-ish rectangle with rounded top
        draw.rounded_rectangle(
            (cx - 0.7 * r, cy - r, cx + 0.7 * r, cy + r),
            radius=int(0.5 * r),
            fill=color,
            outline=outline,
            width=2,
        )


def _random_scene(rng: random.Random, n_min: int = 3, n_max: int = 6) -> List[Dict]:
    n = rng.randint(n_min, n_max)
    objs = []
    taken: List[Tuple[float, float]] = []
    for _ in range(n):
        for _attempt in range(50):
            x, y = rng.uniform(-2.8, 2.8), rng.uniform(-2.8, 2.8)
            if all((x - tx) ** 2 + (y - ty) ** 2 > 1.2 for tx, ty in taken):
                break
        taken.append((x, y))
        objs.append(
            {
                "color": rng.choice(CLEVR_COLORS),
                "shape": rng.choice(CLEVR_SHAPES),
                "material": rng.choice(CLEVR_MATERIALS),
                "size": rng.choice(CLEVR_SIZES),
                "rotation": rng.uniform(0, 360),
                "3d_coords": [x, y, 0.35],
                "pixel_coords": [0, 0, 0],
            }
        )
    return objs


def _make_questions(rng: random.Random, objs: List[Dict]) -> List[Tuple[str, str, str]]:
    """Template (question, answer, final_program_function) computed from the scene.

    Covers all five CLEVR question families (count / exist / compare-numbers /
    query-attribute / compare-attribute) so per-category eval reporting has
    every row populated; the final program function is emitted into the
    questions JSON like real CLEVR (rnet.data.categories classifies by it).
    """
    qs: List[Tuple[str, str, str]] = []

    color = rng.choice(CLEVR_COLORS)
    count = sum(o["color"] == color for o in objs)
    qs.append((f"How many {color} things are there?", str(count), "count"))

    shape = rng.choice(CLEVR_SHAPES)
    exist = any(o["shape"] == shape for o in objs)
    qs.append((f"Is there a {shape} in the scene?", "yes" if exist else "no", "exist"))

    # query-attribute on a uniquely-colored object, when one exists
    for o in objs:
        if sum(p["color"] == o["color"] for p in objs) == 1:
            attr = rng.choice(["shape", "material", "size"])
            qs.append((f"What {attr} is the {o['color']} thing?", o[attr], f"query_{attr}"))
            break

    c1, c2 = rng.sample(list(CLEVR_COLORS), 2)
    n1 = sum(o["color"] == c1 for o in objs)
    n2 = sum(o["color"] == c2 for o in objs)
    qs.append(
        (
            f"Are there more {c1} things than {c2} things?",
            "yes" if n1 > n2 else "no",
            "greater_than",
        )
    )

    # query color of a uniquely-shaped object
    for o in objs:
        if sum(p["shape"] == o["shape"] for p in objs) == 1:
            qs.append((f"What color is the {o['shape']}?", o["color"], "query_color"))
            break

    # compare-attribute between two uniquely-colored objects
    uniq = [o for o in objs if sum(p["color"] == o["color"] for p in objs) == 1]
    if len(uniq) >= 2:
        a, b = rng.sample(uniq, 2)
        attr = rng.choice(["shape", "material", "size"])
        qs.append(
            (
                f"Is the {a['color']} thing the same {attr} as the {b['color']} thing?",
                "yes" if a[attr] == b[attr] else "no",
                f"equal_{attr}",
            )
        )
    return qs


def generate(
    root: str,
    n_train: int = 32,
    n_val: int = 8,
    image_hw: Tuple[int, int] = (120, 160),
    seed: int = 0,
) -> str:
    """Write a miniature CLEVR-schema dataset under ``root``. Returns root."""
    rng = random.Random(seed)
    H, W = image_hw
    for split, n_images in (("train", n_train), ("val", n_val)):
        img_dir = os.path.join(root, "images", split)
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(os.path.join(root, "questions"), exist_ok=True)
        os.makedirs(os.path.join(root, "scenes"), exist_ok=True)

        scenes, questions = [], []
        for idx in range(n_images):
            objs = _random_scene(rng)
            fname = f"CLEVR_{split}_{idx:06d}.png"
            img = Image.new("RGB", (W, H), (210, 210, 210))
            _draw = ImageDraw.Draw(img)
            # painter's order: back-to-front by y
            for o in sorted(objs, key=lambda o: o["3d_coords"][1]):
                _draw_object(_draw, o, W, H)
            img.save(os.path.join(img_dir, fname))

            scenes.append(
                {
                    "split": split,
                    "image_index": idx,
                    "image_filename": fname,
                    "objects": objs,
                    "directions": {},
                }
            )
            for q, a, fn in _make_questions(rng, objs):
                questions.append(
                    {
                        "split": split,
                        "image_index": idx,
                        "image_filename": fname,
                        "question": q,
                        "answer": a,
                        "question_index": len(questions),
                        "question_family_index": 0,
                        "program": [{"function": fn, "inputs": [], "value_inputs": []}],
                    }
                )

        if split == "train":
            # Real CLEVR train covers the full 28-answer universe; guarantee the
            # same here so val never hits an unseen answer (dictionaries are
            # built from train only, as in the reference).
            present = {q["answer"] for q in questions}
            templates = {
                **{n: (f"How many things are there exactly {n}?", "count")
                   for n in map(str, range(11))},
                **{b: (f"Is there anything at all {b}?", "exist") for b in ("yes", "no")},
                **{c: (f"What color is the thing that is {c}?", "query_color")
                   for c in CLEVR_COLORS},
                **{s: (f"What shape is the thing that is a {s}?", "query_shape")
                   for s in CLEVR_SHAPES},
                **{m: (f"What material is the thing made of {m}?", "query_material")
                   for m in CLEVR_MATERIALS},
                **{s: (f"What size is the thing that is {s}?", "query_size")
                   for s in CLEVR_SIZES},
            }
            for ans, (qtext, fn) in templates.items():
                if ans not in present:
                    questions.append(
                        {
                            "split": split,
                            "image_index": 0,
                            "image_filename": f"CLEVR_{split}_000000.png",
                            "question": qtext,
                            "answer": ans,
                            "question_index": len(questions),
                            "question_family_index": 999,
                            "program": [{"function": fn, "inputs": [], "value_inputs": []}],
                        }
                    )

        with open(os.path.join(root, "questions", f"CLEVR_{split}_questions.json"), "w") as f:
            json.dump({"info": {"split": split, "synthetic": True}, "questions": questions}, f)
        with open(os.path.join(root, "scenes", f"CLEVR_{split}_scenes.json"), "w") as f:
            json.dump({"info": {"split": split, "synthetic": True}, "scenes": scenes}, f)
    return root


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description="Generate a synthetic CLEVR-schema fixture")
    p.add_argument("root")
    p.add_argument("--n-train", type=int, default=32)
    p.add_argument("--n-val", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()
    generate(a.root, a.n_train, a.n_val, seed=a.seed)
    print(f"wrote synthetic CLEVR fixture to {a.root}")
