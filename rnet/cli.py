"""Shared CLI plumbing for train.py / test.py / extract.py.

Flag surface mirrors the reference's argparse (SURVEY.md section 5 "Config /
flag system"): --model selects a config.json entry; per-field overrides
(--dropout, --question-injection); --clevr-dir, --invert-questions,
--clip-norm, --resume, --epochs, --batch-size, --seed, --log-interval,
--test-results-dir, --features-dirs; LR/BS doubling knobs. TPU-native extras:
--mesh, --precision, --rl-impl.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Any, Dict, Tuple

from .config import DEFAULT_CONFIG_PATH, ModelConfig, load_config
from .data.clevr import ClevrDataset, ClevrDatasetStateDescription
from .data.vocab import Dictionaries, build_dictionaries


def add_common_args(p: argparse.ArgumentParser, clevr_required: bool = True) -> None:
    # serve.py runs without a data dir (dictionaries come carried by the
    # checkpoint); every other CLI requires one
    p.add_argument(
        "--clevr-dir",
        required=clevr_required,
        default=None,
        help="CLEVR_v1.0 root directory",
    )
    p.add_argument("--model", default="original-fp", help="config.json model name")
    p.add_argument("--config", default=DEFAULT_CONFIG_PATH, help="config.json path")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--log-interval", type=int, default=10)
    p.add_argument("--num-workers", type=int, default=8, help="decode threads")
    p.add_argument(
        "--invert-questions",
        dest="invert",
        action="store_true",
        default=True,
        help="reverse question token order (default on, as in the reference)",
    )
    p.add_argument("--no-invert-questions", dest="invert", action="store_false")
    p.add_argument(
        "--oov",
        choices=["error", "unk", "drop"],
        default="error",
        help="out-of-vocabulary question words: error (reference KeyError "
        "behavior, default), unk (dedicated trainable index), drop (skip)",
    )
    # config overrides
    p.add_argument("--dropout", type=float, default=None)
    p.add_argument(
        "--question-injection",
        type=int,
        default=None,
        dest="question_injection_position",
        help="g layer index where the question is concatenated",
    )
    p.add_argument("--pair-dropout", type=float, default=None, dest="pair_dropout")
    p.add_argument(
        "--pair-pool",
        choices=["sum", "mean"],
        default=None,
        dest="pair_pool",
        help="pooling over the n^2 pair axis: sum (reference parity, "
        "default) or mean (pooled/n^2 — keeps f_phi's input O(1) at "
        "extreme pair counts; required in practice for the 32x32 grid)",
    )
    p.add_argument(
        "--object-mask",
        dest="object_mask",
        action="store_true",
        default=None,
        help="exclude pad-object pairs from the relational sum "
        "(state-description models; default off = reference behavior, "
        "zero-vector pads participate in pairs)",
    )
    p.add_argument(
        "--lstm-pad-drift",
        dest="lstm_mask_pads",
        action="store_false",
        default=None,
        help="run the LSTM over pad steps like the reference (zero inputs, "
        "gate-bias state drift; with inverted questions pads lead, so this "
        "reproduces the reference's pad handling exactly). Default: "
        "mask-aware carry (documented parity deviation; this flag is the "
        "A/B switch for quantifying it)",
    )
    # TPU-native knobs
    p.add_argument(
        "--precision",
        choices=["bfloat16", "float32"],
        default=None,
        dest="compute_dtype",
    )
    p.add_argument(
        "--rl-impl",
        choices=["auto", "naive", "xla", "pallas", "pallas_int8"],
        default=None,
        dest="rl_impl",
        help="pairwise-core implementation (default: auto; pallas_int8 = "
        "int8-MXU inference quantization, eval only)",
    )
    p.add_argument(
        "--mesh",
        default=None,
        help='device mesh spec, e.g. "data:8" or "data:4,pairs:2" (default: all devices on data)',
    )
    p.add_argument(
        "--platform",
        choices=["default", "cpu"],
        default="default",
        help="force the JAX platform (reference --no-cuda analog: 'cpu')",
    )
    p.add_argument(
        "--data-pipeline",
        choices=["pil", "cached", "device"],
        default="pil",
        help="pil: per-item decode (reference-style); cached: decoded uint8 "
        "memmap + vectorized batches + on-device crop/rotation; device: the "
        "whole decoded split lives in HBM and batches carry only indices "
        "(CLEVR train at 144^2 uint8 is ~4.2 GB)",
    )
    p.add_argument(
        "--device-augment",
        dest="device_augment",
        action=argparse.BooleanOptionalAction,
        default=None,
        help="run train-time crop/rotation on device (default ON under "
        "--data-pipeline cached/device; --no-device-augment trains on the "
        "deterministic center view — round 5 added the negative form: "
        "augmentation was previously impossible to disable under the device "
        "pipeline, which silently voided a no-augment A/B arm)",
    )
    p.add_argument(
        "--augment-impl",
        choices=["auto", "pallas", "xla"],
        default=None,
        dest="augment_impl",
        help="device augmentation implementation (auto: fused Pallas "
        "gather+crop+rotate kernel on TPU, XLA formulation elsewhere)",
    )


def apply_platform(args: argparse.Namespace) -> None:
    """Honor --platform cpu BEFORE any jax backend initialization."""
    if getattr(args, "platform", "default") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")


def config_from_args(args: argparse.Namespace, dicts: Dictionaries) -> ModelConfig:
    overrides = {
        k: getattr(args, k, None)
        for k in (
            "dropout",
            "question_injection_position",
            "pair_dropout",
            "pair_pool",
            "object_mask",
            "lstm_mask_pads",
            "compute_dtype",
            "rl_impl",
            "device_augment",
            "augment_impl",
        )
    }
    if (
        getattr(args, "data_pipeline", "pil") in ("cached", "device")
        and overrides.get("device_augment") is None
    ):
        overrides["device_augment"] = True
    cfg = load_config(args.model, args.config, overrides)
    return cfg.replace(n_answers=dicts.n_answers)


def build_datasets(
    args: argparse.Namespace,
    cfg: ModelConfig,
    dicts: Dictionaries,
    splits=("train", "val"),
    eval_only: bool = False,
) -> Dict[str, Any]:
    """eval_only forces the deterministic eval transform for every split
    (accuracy on --split train must not be measured under augmentation)."""
    out = {}
    for split in splits:
        train_tf = (split == "train") and not eval_only
        if cfg.state_description:
            out[split] = ClevrDatasetStateDescription(
                args.clevr_dir,
                split,
                dicts,
                max_objects=cfg.max_objects,
                object_dim=cfg.object_dim,
                question_max_len=cfg.question_max_len,
            )
        elif getattr(args, "data_pipeline", "pil") in ("cached", "device"):
            from .data.cache import CachedClevrDataset

            out[split] = CachedClevrDataset(
                args.clevr_dir,
                split,
                dicts,
                image_size=cfg.image_size,
                question_max_len=cfg.question_max_len,
                train_transform=train_tf,
                # with device_augment the crop ALSO moves on device: ship
                # padded images so batch assembly is one gather
                serve_padded=cfg.device_augment,
                serve_indices=(args.data_pipeline == "device"),
            )
        else:
            out[split] = ClevrDataset(
                args.clevr_dir,
                split,
                dicts,
                image_size=cfg.image_size,
                question_max_len=cfg.question_max_len,
                train_transform=train_tf,
                # rotation happens on device when device_augment is on —
                # don't rotate twice
                max_rot_deg=0.0 if cfg.device_augment else 2.8,
            )
    return out


def load_dicts(
    args: argparse.Namespace, checkpoint=None, checkpoint_dir=None
) -> Dictionaries:
    """Build dictionaries from the data dir — or, when evaluating a
    checkpoint that carries its training-time dictionaries, use THOSE.

    Word/answer indices are assigned in first-seen data order, so a
    regenerated dataset permutes them; scoring a checkpoint through permuted
    maps silently scrambles the answer head (observed: 0.32 accuracy at
    NLL 11.9). The carried maps make eval/extract independent of the data
    dir's index assignment; question words outside the carried vocab follow
    the --oov policy."""
    oov = getattr(args, "oov", "error")
    if checkpoint is not None:
        from rnet.train.checkpoint import load_exported_dicts, load_run_dicts

        carried, src = None, None
        ck = str(checkpoint)
        if ck.endswith(".pkl") and os.path.exists(ck):
            carried, src = load_exported_dicts(ck), ck
        else:
            # an explicit orbax epoch path names its run: the sidecar next
            # to it takes PRECEDENCE over --checkpoint-dir's (which may
            # default to ./model and belong to an unrelated run — pairing
            # exp A's weights with dir B's maps permutes the answer head)
            if os.path.isdir(ck):
                carried = load_run_dicts(os.path.dirname(ck), args.model)
                src = os.path.dirname(ck)
            if carried is None and checkpoint_dir is not None:
                carried = load_run_dicts(checkpoint_dir, args.model)
                src = checkpoint_dir
        if carried is not None:
            w2i, a2i = carried
            # stderr: serve.py's stdout is a JSON-lines protocol — any
            # informational print on stdout corrupts a parsing client
            print(
                f"dictionaries: carried by checkpoint ({src}; "
                f"{len(w2i)} words, {len(a2i)} answers)",
                file=sys.stderr,
            )
            return Dictionaries(w2i, a2i, oov=oov)
        print(
            "WARNING: checkpoint carries no dictionaries (pre-round-4 "
            "artifact?) — word/answer indices come from --clevr-dir; if "
            "this is not the original training data, accuracy is "
            "meaningless (index permutation).",
            file=sys.stderr,
        )
    if getattr(args, "clevr_dir", None) is None:
        raise SystemExit(
            "no dictionaries available: the checkpoint carries none and no "
            "--clevr-dir was given to rebuild them from training data"
        )
    return build_dictionaries(args.clevr_dir, oov=oov)
