#!/usr/bin/env python
"""Evaluate a trained Relation Network on CLEVR val (TPU-native).

Reference-parity CLI (SURVEY.md 3.2, reference test.py): loads a checkpoint,
runs the val split, prints overall accuracy, and dumps per-answer-class
accuracies + confusion matrix (csv/png) into --test-results-dir.
"""

from __future__ import annotations

import argparse
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    from rnet.cli import add_common_args

    add_common_args(p)
    p.add_argument(
        "--checkpoint",
        required=True,
        help="orbax checkpoint path, epoch number, or weights-only .pkl export",
    )
    p.add_argument("--checkpoint-dir", default="model")
    p.add_argument("--test-results-dir", default="results")
    p.add_argument("--split", default="val")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from rnet.cli import build_datasets, config_from_args, load_dicts
    from rnet.train.checkpoint import import_weights
    from rnet.train.loop import Trainer
    from rnet.train.schedules import DoublingSchedule

    from rnet.cli import apply_platform

    apply_platform(args)
    dicts = load_dicts(
        args, checkpoint=args.checkpoint, checkpoint_dir=args.checkpoint_dir
    )
    cfg = config_from_args(args, dicts)
    # eval only needs the requested split (deterministic transform: no
    # augmentation even for --split train) — avoids decoding/uploading the
    # train split just to build the model skeleton.
    ds = build_datasets(args, cfg, dicts, splits=(args.split,), eval_only=True)

    trainer = Trainer(
        cfg,
        dicts.vocab_size,
        ds[args.split],
        ds[args.split],
        dicts,
        lr=DoublingSchedule(1e-4),
        bs=DoublingSchedule(args.batch_size, 1.0, 0),
        seed=args.seed,
        invert=args.invert,
        num_threads=args.num_workers,
        mesh_spec=args.mesh,
        checkpoint_dir=args.checkpoint_dir,
        log_interval=args.log_interval,
        device_data=(args.data_pipeline == "device"),
    )
    if str(args.checkpoint).endswith(".pkl"):
        trainer.state = import_weights(trainer.state, args.checkpoint)
    else:
        ckpt = int(args.checkpoint) if str(args.checkpoint).isdigit() else args.checkpoint
        # weights-only restore: eval never needs optimizer moments, and the
        # checkpoint's optimizer tree may differ from this skeleton's
        trainer.restore_weights(ckpt)

    if cfg.rl_impl == "pallas_int8":
        # calibration-drift receipt: fraction of probe activations per layer
        # that would hard-clip at 127 under this batch's int8 scales
        fr = trainer.int8_clip_report(batch_size=min(args.batch_size, 256))
        print(
            "int8 calibration clip fractions per layer: "
            + "[" + ", ".join(f"{f:.2e}" for f in fr) + "]"
        )
        if float(fr.max()) > 1e-3:
            print(
                "WARNING: clip fraction > 1e-3 — the 1.2x calibration margin "
                "is being exceeded; int8 accuracy may drift on this data"
            )

    stats = trainer.eval_epoch(trainer.epoch, batch_size=args.batch_size)
    acc = stats.pop("_accumulator")
    paths = acc.dump(args.test_results_dir, tag=args.split)
    print(f"overall accuracy: {acc.accuracy:.4f} | mean NLL: {acc.mean_nll:.4f}")
    cat = acc.per_category_accuracy()
    if cat:  # reference test.py table shape: accuracy per question family
        print("per question category:")
        for c, v in sorted(cat.items()):
            print(f"  {c:18s}: {v:.4f}")
    print("per answer class:")
    for cls, v in sorted(acc.per_class_accuracy().items()):
        print(f"  {cls:10s}: {v:.4f}")
    print(f"reports: {paths}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
