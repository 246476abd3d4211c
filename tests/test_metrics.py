"""EvalAccumulator unit tests: confusion math, per-class grouping, dumps."""

import csv
import os

import numpy as np

from rnet.data.vocab import Dictionaries
from rnet.eval.metrics import EvalAccumulator


def _dicts():
    words = {w: i + 1 for i, w in enumerate(["what", "color", "is"])}
    answers = {a: i for i, a in enumerate(["0", "1", "yes", "no", "red", "cube"])}
    return Dictionaries(words, answers)


def test_accumulator_confusion_and_accuracy():
    d = _dicts()
    acc = EvalAccumulator(d)
    #               true                     pred                    valid
    acc.update(np.array([0, 2, 4]), np.array([0, 2, 4]), np.array([1, 1, 1], bool), nll_sum=3.0)
    acc.update(np.array([5, 5]), np.array([5, 4]), np.array([1, 1], bool), nll_sum=2.0)
    # pred=labels swapped order in update signature: update(pred, labels, valid)
    assert acc.n == 5
    assert acc.mean_nll == (3.0 + 2.0) / 5
    # first batch all correct; second: true=5 pred=5 (correct), true=4 pred=5 (wrong)
    assert acc.accuracy == 4 / 5
    assert acc.confusion[5, 5] == 1 and acc.confusion[4, 5] == 1


def test_accumulator_ignores_invalid_rows():
    d = _dicts()
    acc = EvalAccumulator(d)
    acc.update(np.array([0, 1]), np.array([0, 1]), np.array([1, 0], bool))
    assert acc.n == 1 and acc.accuracy == 1.0


def test_per_class_grouping():
    d = _dicts()
    acc = EvalAccumulator(d)
    # numbers: "0" right, "1" wrong; exist: "yes" right; color: "red" right
    acc.update(
        np.array([0, 0, 2, 4]),  # pred
        np.array([0, 1, 2, 4]),  # true
        np.ones(4, bool),
    )
    pc = acc.per_class_accuracy()
    assert pc["number"] == 0.5
    assert pc["exist"] == 1.0
    assert pc["color"] == 1.0
    pa = acc.per_answer_accuracy()
    assert pa["0"] == 1.0 and pa["1"] == 0.0


def test_dump_files(tmp_path):
    d = _dicts()
    acc = EvalAccumulator(d)
    acc.update(np.array([0, 2]), np.array([0, 3]), np.ones(2, bool), nll_sum=1.0)
    paths = acc.dump(str(tmp_path), tag="t")
    with open(paths["accuracy_csv"]) as f:
        rows = {r[0]: r[1] for r in csv.reader(f) if r}
    assert float(rows["overall_accuracy"]) == 0.5
    with open(paths["confusion_csv"]) as f:
        lines = list(csv.reader(f))
    assert len(lines) == 1 + d.n_answers
    assert os.path.exists(paths.get("confusion_png", paths["confusion_csv"]))


def test_question_category_classifier():
    from rnet.data.categories import QUESTION_CATEGORIES, question_category

    # program-based (real CLEVR shape)
    assert question_category({"program": [{"function": "count"}]}) == "count"
    assert question_category({"program": [{"function": "exist"}]}) == "exist"
    assert question_category({"program": [{"function": "greater_than"}]}) == "compare_numbers"
    assert question_category({"program": [{"function": "equal_integer"}]}) == "compare_numbers"
    assert question_category({"program": [{"function": "query_material"}]}) == "query_attribute"
    assert question_category({"program": [{"function": "equal_shape"}]}) == "compare_attribute"
    # "type" key variant
    assert question_category({"program": [{"type": "query_size"}]}) == "query_attribute"
    # text fallback (no program)
    assert question_category({"question": "How many red things are there?"}) == "count"
    assert question_category({"question": "Is there a cube in the scene?"}) == "exist"
    assert question_category({"question": "Are there more red things than blue things?"}) == "compare_numbers"
    assert question_category({"question": "What material is the red thing?"}) == "query_attribute"
    assert (
        question_category({"question": "Is the red thing the same shape as the blue thing?"})
        == "compare_attribute"
    )
    assert set(QUESTION_CATEGORIES) >= {
        "count", "exist", "compare_numbers", "query_attribute", "compare_attribute",
    }


def test_per_category_accuracy():
    from rnet.data.categories import QUESTION_CATEGORIES

    d = _dicts()
    cats = np.array(
        [QUESTION_CATEGORIES.index("count"), QUESTION_CATEGORIES.index("count"),
         QUESTION_CATEGORIES.index("exist"), QUESTION_CATEGORIES.index("compare_attribute")],
        dtype=np.int32,
    )
    acc = EvalAccumulator(d, categories=cats)
    # questions 0,1 are count (one right, one wrong); 2 exist (right);
    # 3 compare_attribute (right) -- exist and compare_attribute both answer
    # yes/no yet land in separate category rows (the answer-value grouping
    # cannot do this).
    acc.update(
        np.array([0, 0, 2, 3]),  # pred
        np.array([0, 1, 2, 3]),  # true
        np.ones(4, bool),
        qidx=np.array([0, 1, 2, 3]),
    )
    pc = acc.per_category_accuracy()
    assert pc["count"] == 0.5
    assert pc["exist"] == 1.0
    assert pc["compare_attribute"] == 1.0
    assert "query_attribute" not in pc  # zero questions -> omitted


def test_synth_fixture_covers_all_categories(fixture_dir):
    import json
    import os

    from rnet.data.categories import QUESTION_CATEGORIES, category_ids

    with open(os.path.join(fixture_dir, "questions", "CLEVR_train_questions.json")) as f:
        questions = json.load(f)["questions"]
    ids = category_ids(questions)
    present = {QUESTION_CATEGORIES[i] for i in set(ids.tolist())}
    assert {"count", "exist", "compare_numbers", "query_attribute"} <= present
    assert "other" not in present
