#!/usr/bin/env python
"""Train a Relation Network on CLEVR (TPU-native).

Reference-parity CLI (SURVEY.md 3.1, reference train.py): config selection,
LR/batch-size doubling schedules, per-epoch eval + checkpoint, --resume.

Example:
    python train.py --clevr-dir /data/CLEVR_v1.0 --model original-fp \
        --epochs 400 --batch-size 640 --lr 1e-4 --lr-max 5e-4
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    from rnet.cli import add_common_args

    add_common_args(p)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr-gamma", type=float, default=2.0)
    p.add_argument("--lr-step", type=int, default=20, help="epochs between LR doublings (0: constant)")
    p.add_argument("--lr-max", type=float, default=5e-4)
    p.add_argument("--bs-gamma", type=float, default=1.0)
    p.add_argument("--bs-step", type=int, default=0, help="epochs between batch-size doublings (0: constant)")
    p.add_argument("--bs-max", type=int, default=None)
    p.add_argument("--clip-norm", type=float, default=50.0)
    p.add_argument("--weight-decay", type=float, default=0.0)
    p.add_argument(
        "--resume",
        default=None,
        help="checkpoint path, epoch number, or 'latest' (crash recovery)",
    )
    p.add_argument("--checkpoint-dir", default="model")
    p.add_argument(
        "--keep-checkpoints",
        type=int,
        default=0,
        help="garbage-collect all but the newest N checkpoints "
        "(0, the default, keeps every epoch like the reference)",
    )
    p.add_argument("--test-results-dir", default=None)
    p.add_argument("--eval-every", type=int, default=1)
    p.add_argument("--save-every", type=int, default=1)
    p.add_argument(
        "--multihost",
        action="store_true",
        help="initialize jax.distributed (multi-host DCN training; "
        "coordinator from standard env vars)",
    )
    p.add_argument("--tb-dir", default=None, help="TensorBoard/CSV scalar log dir")
    p.add_argument(
        "--profile-dir",
        default=None,
        help="write a jax.profiler trace of one epoch here (see --profile-epoch)",
    )
    p.add_argument("--profile-epoch", type=int, default=1)
    p.add_argument(
        "--stall-timeout",
        type=float,
        default=0.0,
        help="seconds without training progress before the process "
        "hard-exits for a supervised restart (0: off). The device relay "
        "can hang a blocking call forever; pick a value above the longest "
        "legitimate SINGLE gap — the first chunk of each batch-size phase "
        "includes the XLA compile, minutes for large programs (900 is a "
        "safe default on this backend). Trainer init beats between its "
        "stages, so the timeout bounds one cache upload / one compile, "
        "not the whole init; a multi-GB device-pipeline cache upload is "
        "one blocking call — raise the timeout above it.",
    )
    p.add_argument(
        "--auto-restart",
        type=int,
        default=0,
        help="supervise training: relaunch with --resume latest up to N "
        "times whenever the run exits on a detected stall "
        "(use with --stall-timeout; other exit codes are never retried)",
    )
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.auto_restart > 0:
        # supervisor mode: run the same command as a child process (minus
        # --auto-restart) and relaunch it with --resume latest on each
        # stall exit. The child does all the actual work; this process only
        # watches exit codes, so a wedged relay can never take it down.
        from rnet.utils.watchdog import strip_flag, supervise

        child_argv = strip_flag(
            list(sys.argv[1:]) if argv is None else list(argv), "--auto-restart"
        )
        if args.stall_timeout <= 0:
            print(
                "WARNING: --auto-restart without --stall-timeout — stalls "
                "hang forever and are never detected; restarts only cover "
                "stall exits from a watchdog-enabled child"
            )
        return supervise(
            [sys.executable, os.path.abspath(__file__)] + child_argv,
            max_restarts=args.auto_restart,
        )
    if args.multihost:
        from rnet.parallel.mesh import distributed_init

        distributed_init()
    from rnet.cli import build_datasets, config_from_args, load_dicts
    from rnet.train.loop import Trainer
    from rnet.train.schedules import DoublingSchedule

    from rnet.cli import apply_platform

    apply_platform(args)
    dicts = load_dicts(args)
    cfg = config_from_args(args, dicts)
    print(f"model: {cfg.name} | vocab {dicts.vocab_size} | answers {dicts.n_answers}")
    print(f"config: {cfg}")
    ds = build_datasets(args, cfg, dicts)

    watchdog = None
    if args.stall_timeout > 0:
        from rnet.utils.watchdog import Watchdog

        watchdog = Watchdog(args.stall_timeout).start()
        print(f"stall watchdog armed: {args.stall_timeout:.0f}s")

    trainer = Trainer(
        cfg,
        dicts.vocab_size,
        ds["train"],
        ds["val"],
        dicts,
        lr=DoublingSchedule(args.lr, args.lr_gamma, args.lr_step, args.lr_max),
        bs=DoublingSchedule(args.batch_size, args.bs_gamma, args.bs_step, args.bs_max),
        clip_norm=args.clip_norm,
        weight_decay=args.weight_decay,
        seed=args.seed,
        invert=args.invert,
        num_threads=args.num_workers,
        mesh_spec=args.mesh,
        checkpoint_dir=args.checkpoint_dir,
        keep_checkpoints=args.keep_checkpoints,
        log_interval=args.log_interval,
        tb_dir=args.tb_dir,
        profile_dir=args.profile_dir,
        profile_epoch=args.profile_epoch,
        device_data=(args.data_pipeline == "device"),
        watchdog=watchdog,
    )
    if watchdog is not None:
        watchdog.beat()  # Trainer init (device caches, first compile) done
    if args.resume is not None:
        if str(args.resume) == "latest":
            latest = trainer.ckpt.latest_epoch()
            if latest is None:
                print("no checkpoint found for --resume latest; starting fresh")
                resume = None
            else:
                resume = latest
        else:
            resume = int(args.resume) if str(args.resume).isdigit() else args.resume
        if resume is not None:
            epoch = trainer.resume(resume)
            print(f"resumed from {args.resume} (epoch {epoch})")

    history = trainer.fit(
        args.epochs,
        eval_every=args.eval_every,
        save_every=args.save_every,
        results_dir=args.test_results_dir,
    )
    if watchdog is not None:
        watchdog.stop()
    if args.test_results_dir:
        os.makedirs(args.test_results_dir, exist_ok=True)
        with open(os.path.join(args.test_results_dir, "history.json"), "w") as f:
            json.dump(history, f, indent=2)
    if history:
        last = history[-1]
        print(
            f"done: epoch {last['epoch']} train_loss {last['train_loss']:.4f}"
            + (f" val_acc {last['val_acc']:.4f}" if "val_acc" in last else "")
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
