"""End-to-end CLI tests on the synthetic fixture (SURVEY.md section 4 item 4).

Runs train.py / test.py / extract.py mains in-process (argv-style), the same
surfaces a reference user drives.
"""

import json
import os
import pickle
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import extract as extract_cli
import test as test_cli
import train as train_cli

# every test here trains a model through the CLI (or depends on the module
# fixture that does) — run with `pytest -m slow` / `-m "slow or not slow"`
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def trained(fixture_dir, tmp_path_factory):
    """Train original-sd for 2 epochs; shared by the CLI tests."""
    root = tmp_path_factory.mktemp("cli_run")
    ckpt_dir = str(root / "model")
    results = str(root / "results")
    rc = train_cli.main(
        [
            "--clevr-dir", fixture_dir,
            "--model", "original-sd",
            "--epochs", "2",
            "--batch-size", "16",
            "--lr", "1e-3",
            "--lr-step", "0",
            "--precision", "float32",
            "--checkpoint-dir", ckpt_dir,
            "--test-results-dir", results,
            "--log-interval", "100",
        ]
    )
    assert rc == 0
    return {"ckpt_dir": ckpt_dir, "results": results}


def test_train_cli_outputs(trained):
    names = os.listdir(trained["ckpt_dir"])
    assert any("original-sd_epoch_002" in n for n in names), names
    with open(os.path.join(trained["results"], "history.json")) as f:
        hist = json.load(f)
    assert len(hist) == 2 and "val_acc" in hist[-1]
    # per-epoch eval reports dumped
    assert any(f.startswith("val_epoch") for f in os.listdir(trained["results"]))


def test_train_cli_resume(trained, fixture_dir, tmp_path):
    results = str(tmp_path / "results2")
    rc = train_cli.main(
        [
            "--clevr-dir", fixture_dir,
            "--model", "original-sd",
            "--epochs", "3",
            "--batch-size", "16",
            "--precision", "float32",
            "--checkpoint-dir", trained["ckpt_dir"],
            "--test-results-dir", results,
            "--resume", "2",
            "--log-interval", "100",
        ]
    )
    assert rc == 0
    with open(os.path.join(results, "history.json")) as f:
        hist = json.load(f)
    assert [h["epoch"] for h in hist] == [3]  # continued, not restarted


def test_test_cli(trained, fixture_dir, tmp_path):
    results = str(tmp_path / "eval_results")
    rc = test_cli.main(
        [
            "--clevr-dir", fixture_dir,
            "--model", "original-sd",
            "--precision", "float32",
            "--checkpoint", "2",
            "--checkpoint-dir", trained["ckpt_dir"],
            "--test-results-dir", results,
            "--batch-size", "16",
        ]
    )
    assert rc == 0
    assert os.path.exists(os.path.join(results, "val_accuracy.csv"))
    assert os.path.exists(os.path.join(results, "val_confusion.csv"))
    with open(os.path.join(results, "val_accuracy.csv")) as f:
        keys = {line.split(",")[0] for line in f}
    # reference-style question-family rows (SURVEY.md 3.2)
    assert any(k.startswith("category_") for k in keys), keys


def test_extract_cli(fixture_dir, tmp_path):
    ckpt_dir = str(tmp_path / "model_ir")
    rc = train_cli.main(
        [
            "--clevr-dir", fixture_dir,
            "--model", "ir-sd",
            "--epochs", "1",
            "--batch-size", "16",
            "--precision", "float32",
            "--checkpoint-dir", ckpt_dir,
            "--log-interval", "100",
        ]
    )
    assert rc == 0
    feat_dir = str(tmp_path / "features")
    rc = extract_cli.main(
        [
            "--clevr-dir", fixture_dir,
            "--model", "ir-sd",
            "--precision", "float32",
            "--checkpoint", "1",
            "--checkpoint-dir", ckpt_dir,
            "--features-dirs", feat_dir,
            "--batch-size", "16",
            "--split", "val",
        ]
    )
    assert rc == 0
    pkl = os.path.join(feat_dir, "ir-sd_val_gfeatures.pkl")
    with open(pkl, "rb") as f:
        dump = pickle.load(f)
    assert dump["features"].ndim == 2
    assert dump["features"].shape[1] == 512  # g_layers[inject-1]


def test_extract_cli_rejects_non_ir(fixture_dir, tmp_path):
    rc = extract_cli.main(
        [
            "--clevr-dir", fixture_dir,
            "--model", "original-sd",
            "--checkpoint", "1",
            "--features-dirs", str(tmp_path / "f"),
        ]
    )
    assert rc == 2


def test_train_cli_resume_latest(trained, fixture_dir, tmp_path):
    """--resume latest picks the newest checkpoint (crash recovery story)."""
    results = str(tmp_path / "results_latest")
    rc = train_cli.main(
        [
            "--clevr-dir", fixture_dir,
            "--model", "original-sd",
            "--epochs", "5",
            "--batch-size", "16",
            "--precision", "float32",
            "--checkpoint-dir", trained["ckpt_dir"],
            "--test-results-dir", results,
            "--resume", "latest",
            "--log-interval", "100",
        ]
    )
    assert rc == 0
    with open(os.path.join(results, "history.json")) as f:
        hist = json.load(f)
    assert hist[0]["epoch"] >= 3  # continued from epoch >= 2


def test_train_cli_supervised_with_watchdog(fixture_dir, tmp_path):
    """--auto-restart supervises a child train.py; --stall-timeout arms the
    watchdog inside it (rnet/utils/watchdog.py). A healthy run completes in
    one child with exit 0; the stall/restart mechanics themselves are pinned
    by tests/test_watchdog.py.

    The child is forced to CPU: only ONE process can hold the TPU chip, and
    under RNET_TEST_TPU the pytest process already does — a child train.py
    inheriting the axon env would fight it for the device."""
    ckpt_dir = str(tmp_path / "model")
    results = str(tmp_path / "results")
    rc = train_cli.main(
        [
            "--clevr-dir", fixture_dir,
            "--model", "original-sd",
            "--epochs", "1",
            "--batch-size", "16",
            "--precision", "float32",
            "--platform", "cpu",
            "--checkpoint-dir", ckpt_dir,
            "--test-results-dir", results,
            "--log-interval", "100",
            "--stall-timeout", "600",
            "--auto-restart", "2",
        ]
    )
    assert rc == 0
    assert any("original-sd_epoch_001" in n for n in os.listdir(ckpt_dir))
