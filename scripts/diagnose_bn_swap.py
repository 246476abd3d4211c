"""Attribute an eval-quality flip between two checkpoints: weights or BN stats?

Motivation (round 4, stretch-fp-32): val accuracy oscillates epoch-to-epoch
between ~0.62 (nll ~0.8) and ~0.46 (nll ~14), and the confusion dumps show
the bad epochs answer COUNT questions with attribute words — a question-
family routing flip with stable train loss. Two candidate carriers, both
saved per epoch: the parameters (decision-boundary drift under fixed LR) or
the BatchNorm running statistics (eval-only state; train mode uses batch
stats and never sees it). This script evaluates the 2x2 grid
{paramsA, paramsB} x {bnA, bnB} on the val split; if swapping ONLY
batch_stats moves an epoch across the flip, BN stats are the carrier.

Usage (chip or CPU):
    python scripts/diagnose_bn_swap.py --clevr-dir DIR --model NAME \
        --checkpoint-dir CKDIR --epoch-a 77 --epoch-b 78 \
        [--data-pipeline device] [--batch-size 16]

Evaluates 4 configs in one process (one compile: shapes identical).
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    from rnet.cli import add_common_args

    add_common_args(p)
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--epoch-a", type=int, required=True, help="e.g. a 'bad' epoch")
    p.add_argument("--epoch-b", type=int, required=True, help="e.g. a 'good' epoch")
    p.add_argument("--split", default="val")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from rnet.cli import apply_platform, build_datasets, config_from_args, load_dicts
    from rnet.parallel import mesh as pmesh
    from rnet.train.loop import Trainer
    from rnet.train.schedules import DoublingSchedule

    apply_platform(args)
    dicts = load_dicts(args, checkpoint=args.epoch_a, checkpoint_dir=args.checkpoint_dir)
    cfg = config_from_args(args, dicts)
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

    import jax
    import numpy as np

    def state_of(epoch):
        skel = jax.tree.map(np.asarray, trainer.state)
        return trainer.ckpt.restore_weights(skel, epoch)

    full = {e: state_of(e) for e in (args.epoch_a, args.epoch_b)}
    results = {}
    for pe in (args.epoch_a, args.epoch_b):
        for be in (args.epoch_a, args.epoch_b):
            st = full[pe].replace(batch_stats=full[be].batch_stats)
            trainer.state = pmesh.replicate_state(st, trainer.mesh)
            stats = trainer.eval_epoch(0, batch_size=args.batch_size)
            acc = stats.pop("_accumulator")
            cat = acc.per_category_accuracy() or {}
            results[(pe, be)] = (acc.accuracy, acc.mean_nll, cat.get("count"))
            print(
                f"params=ep{pe} bn=ep{be}: acc={acc.accuracy:.4f} "
                f"nll={acc.mean_nll:.4f} count_acc="
                + (f"{cat['count']:.4f}" if "count" in cat else "n/a")
            )

    a, b = args.epoch_a, args.epoch_b
    pure_a, pure_b = results[(a, a)], results[(b, b)]
    swap_bn = results[(a, b)]  # A's weights, B's BN stats
    gap = abs(pure_b[0] - pure_a[0])
    moved = abs(swap_bn[0] - pure_a[0])
    if gap > 1e-6:
        print(
            f"\nBN-stats swap moved params=ep{a} by {moved / gap:.0%} of the "
            f"ep{a}->ep{b} accuracy gap -> "
            + (
                "BN running statistics are the carrier"
                if moved / gap > 0.5
                else "the parameters are the carrier"
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
