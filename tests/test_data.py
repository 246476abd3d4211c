"""Host-side data layer tests: vocab, fixture schema, datasets, pipeline."""

import json
import os

import numpy as np
import pytest

from rnet.data import synth
from rnet.data.clevr import (
    ClevrDataset,
    ClevrDatasetStateDescription,
    ClevrImageDataset,
    scene_to_objects,
)
from rnet.data.pipeline import BatchIterator
from rnet.data.vocab import (
    PAD_ID,
    Dictionaries,
    answer_class,
    build_dictionaries,
    invert_questions,
    tokenize,
)


def test_tokenize_reference_semantics():
    assert tokenize("Is there a red cube?") == ["is", "there", "a", "red", "cube"]
    assert tokenize("big; small") == ["big", "small"]
    # punctuation other than ?/; splits into its own token
    assert tokenize("what's left") == ["what", "'", "s", "left"]


def test_build_dictionaries_deterministic_and_cached(fixture_dir):
    d1 = build_dictionaries(fixture_dir, use_cache=False)
    d2 = build_dictionaries(fixture_dir)  # writes cache
    d3 = build_dictionaries(fixture_dir)  # reads cache
    assert d1.word_to_idx == d2.word_to_idx == d3.word_to_idx
    assert d1.answer_to_idx == d3.answer_to_idx
    assert min(d1.word_to_idx.values()) == 1  # 0 reserved for padding
    assert os.path.exists(os.path.join(fixture_dir, "rnet_dictionaries.pkl"))


def test_answer_classes():
    assert answer_class("3") == "number"
    assert answer_class("yes") == "exist"
    assert answer_class("cyan") == "color"
    assert answer_class("cube") == "shape"
    assert answer_class("rubber") == "material"
    assert answer_class("small") == "size"


def test_encode_question_pad_and_invert(dicts):
    q = dicts.encode_question("Is there a sphere in the scene?", max_len=10)
    assert q.shape == (10,) and q.dtype == np.int32
    n_real = int((q != PAD_ID).sum())
    assert 0 < n_real < 10
    inv = invert_questions(q[None])[0]
    # reversal puts padding first, real tokens last
    assert (inv[-n_real:] == q[:n_real][::-1]).all()
    assert (inv[:-n_real] == PAD_ID).all()


def test_fixture_schema(fixture_dir):
    with open(os.path.join(fixture_dir, "questions", "CLEVR_train_questions.json")) as f:
        qs = json.load(f)["questions"]
    assert {"image_filename", "question", "answer", "image_index"} <= set(qs[0])
    with open(os.path.join(fixture_dir, "scenes", "CLEVR_val_scenes.json")) as f:
        sc = json.load(f)["scenes"]
    o = sc[0]["objects"][0]
    assert {"color", "shape", "material", "size", "3d_coords"} <= set(o)


def test_pixels_dataset(fixture_dir, dicts):
    ds = ClevrDataset(fixture_dir, "train", dicts, image_size=128, question_max_len=48)
    it = ds[0]
    assert it["image"].shape == (128, 128, 3) and it["image"].dtype == np.uint8
    assert it["question"].shape == (48,)
    assert 0 <= int(it["answer"]) < dicts.n_answers
    # augmentation is deterministic given the same rng seed
    import random

    a = ds.__getitem__(0, rng=random.Random(7))["image"]
    b = ds.__getitem__(0, rng=random.Random(7))["image"]
    assert (a == b).all()


def test_sd_dataset_and_vectorization(fixture_dir, dicts):
    ds = ClevrDatasetStateDescription(fixture_dir, "train", dicts, max_objects=12)
    it = ds[0]
    assert it["objects"].shape == (12, 18)
    n = int(it["n_objects"])
    assert 3 <= n <= 6
    # padding rows are zero; real rows have exactly 4 one-hots + coords
    assert (it["objects"][n:] == 0).all()
    onehots = it["objects"][:n, 3:]
    assert (onehots.sum(axis=1) == 4).all()

    objs = [
        {
            "color": "red",
            "shape": "cube",
            "material": "metal",
            "size": "large",
            "3d_coords": [3.0, -1.5, 0.35],
        }
    ]
    v = scene_to_objects(objs, 4)
    assert v.shape == (4, 18)
    np.testing.assert_allclose(v[0, :3], [1.0, -0.5, 0.35 / 3])
    assert v[0, 3 + 6] == 1.0  # red is index 6 in CLEVR_COLORS


def test_images_only_dataset(fixture_dir):
    ds = ClevrImageDataset(fixture_dir, "val", image_size=128)
    assert len(ds) == 8
    assert ds[3]["image"].shape == (128, 128, 3)


def test_fixture_v3_hard_task(tmp_path):
    """Fixture-v3 invariants (round 5): crowding, the perspective radius law,
    exact labels on the parseable templates (incl. the spatial-relational
    counts), the full 28-answer train universe, and all five families."""
    import re

    from rnet.data.categories import question_category
    from rnet.data.vocab import CLEVR_COLORS

    root = synth.generate(str(tmp_path / "v3"), n_train=12, n_val=4, seed=3, style="v3")
    with open(os.path.join(root, "scenes", "CLEVR_train_scenes.json")) as f:
        scenes = {s["image_index"]: s for s in json.load(f)["scenes"]}
    with open(os.path.join(root, "questions", "CLEVR_train_questions.json")) as f:
        qs = json.load(f)["questions"]

    counts = [len(s["objects"]) for s in scenes.values()]
    assert min(counts) >= 3 and max(counts) <= 10
    assert sum(counts) / len(counts) > 5.0  # crowded on average (v2: 2-5)

    for s in scenes.values():
        for o in s["objects"]:
            base = 0.055 if o["size"] == "small" else 0.10
            depth = (o["3d_coords"][1] + 2.8) / 5.6
            np.testing.assert_allclose(
                o["r_frac"], base * (0.75 + 0.5 * depth), rtol=1e-6
            )

    rel_axis = {"left of": (0, -1), "right of": (0, +1),
                "behind": (1, -1), "in front of": (1, +1)}
    n_spatial = 0
    for q in qs:
        if q["question_family_index"] == 999:  # answer-universe filler rows
            continue
        objs = scenes[q["image_index"]]["objects"]
        if q["question"] == "How many things are there?":
            assert q["answer"] == str(len(objs))
        m = re.match(r"How many (\w+) things are there\?$", q["question"])
        if m and m.group(1) in CLEVR_COLORS:
            assert q["answer"] == str(sum(o["color"] == m.group(1) for o in objs))
        m = re.match(
            r"How many things are (left of|right of|behind|in front of) "
            r"the (\w+) thing\?$",
            q["question"],
        )
        if m:
            n_spatial += 1
            axis, sign = rel_axis[m.group(1)]
            anchors = [o for o in objs if o["color"] == m.group(2)]
            assert len(anchors) == 1  # anchored references are unambiguous
            a = anchors[0]
            want = sum(
                sign * (o["3d_coords"][axis] - a["3d_coords"][axis]) > 0
                for o in objs
                if o is not a
            )
            assert q["answer"] == str(want)
    assert n_spatial > 0  # the new relational template actually fires

    assert len({q["answer"] for q in qs}) == 28  # full train answer universe
    cats = {question_category(q) for q in qs}
    assert {"count", "exist", "compare_numbers", "query_attribute",
            "compare_attribute"} <= cats


@pytest.mark.parametrize("drop_last", [True, False])
def test_batch_iterator_shapes(fixture_dir, dicts, drop_last):
    ds = ClevrDataset(fixture_dir, "val", dicts, image_size=128)
    n = len(ds)
    bs = 16
    it = BatchIterator(ds, bs, shuffle=False, drop_last=drop_last, invert=True)
    batches = list(it)
    if drop_last:
        assert len(batches) == n // bs
    else:
        assert len(batches) == -(-n // bs)
        assert batches[-1]["valid"].sum() == n - bs * (n // bs) or n % bs == 0
    for b in batches:
        assert b["image"].shape == (bs, 128, 128, 3)
        assert b["question"].shape[0] == bs
        assert b["answer"].shape == (bs,)


def test_batch_iterator_shuffle_determinism(fixture_dir, dicts):
    ds = ClevrDatasetStateDescription(fixture_dir, "train", dicts)
    a = [b["answer"] for b in BatchIterator(ds, 8, shuffle=True, seed=1, epoch=3)]
    b = [b["answer"] for b in BatchIterator(ds, 8, shuffle=True, seed=1, epoch=3)]
    c = [b["answer"] for b in BatchIterator(ds, 8, shuffle=True, seed=1, epoch=4)]
    assert all((x == y).all() for x, y in zip(a, b))
    assert any((x != y).any() for x, y in zip(a, c))


def test_oov_policies():
    """OOV knob: error (reference KeyError parity) / unk / drop."""
    import pytest

    from rnet.data.vocab import Dictionaries

    words = {"what": 1, "color": 2, "is": 3}
    answers = {"red": 0}
    d_err = Dictionaries(words, answers)  # default policy
    assert d_err.oov == "error"
    with pytest.raises(KeyError):
        d_err.encode_question("what color is zorp")

    d_unk = Dictionaries(words, answers, oov="unk")
    ids = d_unk.encode_question("what color is zorp")
    assert list(ids) == [1, 2, 3, d_unk.unk_id]
    assert d_unk.vocab_size == len(words) + 2  # pad + words + unk

    d_drop = Dictionaries(words, answers, oov="drop")
    assert list(d_drop.encode_question("what color is zorp")) == [1, 2, 3]
    assert d_drop.vocab_size == len(words) + 1
