#!/usr/bin/env python
"""Serve a trained Relation Network: JSON-lines inference over stdin.

The reference stops at batch evaluation (test.py); this is the deployment
surface the serving-latency sweep (RESULTS.md) sized: compile a BUCKET
LADDER of predict programs (--buckets, default 1/8/--batch-size) and route
each micro-batch to the smallest bucket that fits, so an interactive B=1
request pays B=1 compute (55 us/question chip time on original-fp).

Protocol: one JSON object per input line ->
  from-pixels:        {"image": "<png path>", "question": "..."}
  state-description:  {"objects": [<CLEVR scene objects>], "question": "..."}
one JSON object per output line (same order):
  {"answer": "...", "log_prob": -0.01, "latency_ms": 1.2, "batch": 3,
   "bucket": 8}
or, for a request that cannot be served (malformed JSON, missing/unreadable
image, out-of-vocabulary word under the default --oov error, bad fields):
  {"error": "<reason>"}
Errors are isolated PER REQUEST: the offending line gets an error object in
its output slot and the server keeps serving the rest of the batch and all
later lines. Unknown question words follow --oov: 'error' (default,
reference semantics) rejects that request; 'unk'/'drop' serve it.

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
import io
import json
import os
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
    p.add_argument(
        "--buckets",
        default=None,
        help="comma-separated compiled batch shapes, e.g. '1,8,64' "
        "(default: 1,8,--batch-size); each micro-batch routes to the "
        "smallest bucket that fits",
    )
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

    buckets = (
        [int(b) for b in args.buckets.split(",")] if args.buckets else None
    )
    server = InferenceServer(
        cfg, dicts, invert=args.invert, max_batch=args.batch_size, buckets=buckets
    )
    server.load(args.checkpoint, args.checkpoint_dir)
    server.warmup()
    print(
        f"ready: {cfg.name} | max batch {args.batch_size} | "
        f"buckets {','.join(map(str, server.buckets))} | "
        f"{dicts.n_answers} answers",
        file=sys.stderr,
        flush=True,
    )

    for batch_lines in iter_microbatches(args.batch_size):
        # Malformed JSON is isolated per line: the bad line gets an error
        # object in its output slot; the rest of the batch is served.
        out: list = [None] * len(batch_lines)
        parsed = []  # (slot, request)
        for i, l in enumerate(batch_lines):
            try:
                parsed.append((i, json.loads(l)))
            except ValueError as e:
                out[i] = {"error": f"malformed JSON: {e}"}
        answered = server.answer([r for _, r in parsed])
        for (i, _), res in zip(parsed, answered):
            out[i] = res
        for res in out:
            print(json.dumps(res), flush=True)
    return 0


def iter_microbatches(max_batch: int):
    """Yield lists of non-empty request lines: one blocking read for the
    first, then whatever the client has ALREADY written, up to max_batch.

    This must read the stdin fd RAW (os.read + own line splitting): any
    buffered reader (``for line in sys.stdin``) slurps every available byte
    into its private read-ahead buffer on the first readline, after which
    select() on the fd reports it empty — a pipelined burst of N requests
    silently degrades to N sequential B=1 batches (caught by the round-5
    latency driver: burst buckets_used == [1])."""
    try:
        fd = sys.stdin.fileno()
        select.select([fd], [], [], 0)
    except (OSError, ValueError, AttributeError, io.UnsupportedOperation):
        # not an OS pipe (tests monkeypatch sys.stdin with StringIO):
        # greedy grouping of the in-memory stream preserves the documented
        # "already-buffered lines serve together" semantics
        pending = [l for l in sys.stdin if l.strip()]
        while pending:
            yield pending[:max_batch]
            pending = pending[max_batch:]
        return

    buf = b""
    lines: list = []
    eof = False

    def take_complete_lines():
        nonlocal buf
        while len(lines) < max_batch and b"\n" in buf:
            raw, buf = buf.split(b"\n", 1)
            if raw.strip():
                lines.append(raw.decode("utf-8", "replace"))

    while True:
        take_complete_lines()
        if len(lines) >= max_batch:
            yield lines[:max_batch]
            lines = lines[max_batch:]
            continue
        if eof:
            if buf.strip():  # final line without trailing newline
                lines.append(buf.decode("utf-8", "replace"))
                buf = b""
            if lines:
                yield lines
                lines = []
            return
        if lines:
            # batch has room: take what is already available, but never
            # block while holding pending requests
            r, _, _ = select.select([fd], [], [], 0)
            if not r:
                yield lines
                lines = []
                continue
        chunk = os.read(fd, 1 << 16)
        if not chunk:
            eof = True
        else:
            buf += chunk


if __name__ == "__main__":
    sys.exit(main())
