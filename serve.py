#!/usr/bin/env python
"""Serve a trained Relation Network: JSON-lines inference over stdin.

The reference stops at batch evaluation (test.py); this is the deployment
surface the serving-latency sweep (RESULTS.md) sized: compile one predict
program at --batch-size, then answer ad-hoc requests at micro-batch
latency (55 us/question chip time at B=1 on original-fp).

Protocol: one JSON object per input line ->
  from-pixels:        {"image": "<png path>", "question": "..."}
  state-description:  {"objects": [<CLEVR scene objects>], "question": "..."}
one JSON object per output line (same order):
  {"answer": "...", "log_prob": -0.01, "latency_ms": 1.2, "batch": 3}

Lines already buffered on stdin are served together as one batch (up to
--batch-size), so piping a file gets saturation throughput while
interactive use gets single-request latency. Dictionaries come carried by
the checkpoint (sidecar / pkl 'dicts'); --clevr-dir is only needed for
legacy dict-less checkpoints.

Example:
    echo '{"image": "img.png", "question": "what color is the cube?"}' \\
        | python serve.py --model original-fp --checkpoint model/..._epoch_020
"""

from __future__ import annotations

import argparse
import json
import select
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    from rnet.cli import add_common_args

    add_common_args(p, clevr_required=False)
    p.add_argument(
        "--checkpoint",
        required=True,
        help="orbax checkpoint path, epoch number, or weights-only .pkl export",
    )
    p.add_argument("--checkpoint-dir", default="model")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from rnet.cli import apply_platform, config_from_args, load_dicts

    apply_platform(args)
    dicts = load_dicts(
        args, checkpoint=args.checkpoint, checkpoint_dir=args.checkpoint_dir
    )
    cfg = config_from_args(args, dicts)
    from rnet.serve import InferenceServer

    server = InferenceServer(
        cfg, dicts, invert=args.invert, max_batch=args.batch_size
    )
    server.load(args.checkpoint, args.checkpoint_dir)
    server.warmup()
    print(
        f"ready: {cfg.name} | max batch {args.batch_size} | "
        f"{dicts.n_answers} answers",
        file=sys.stderr,
        flush=True,
    )

    def drain_available(first_line: str) -> list:
        """The first line plus whatever else is already buffered (micro-batch)."""
        lines = [first_line]
        while len(lines) < args.batch_size:
            try:
                r, _, _ = select.select([sys.stdin], [], [], 0)
            except (OSError, ValueError):  # stdin is not selectable (tests)
                break
            if not r:
                break
            nxt = sys.stdin.readline()
            if not nxt:
                break
            if nxt.strip():
                lines.append(nxt)
        return lines

    for line in sys.stdin:
        if not line.strip():
            continue
        batch_lines = drain_available(line)
        requests = [json.loads(l) for l in batch_lines]
        for res in server.answer(requests):
            print(json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
