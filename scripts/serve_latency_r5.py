"""serve.py wall-clock latency receipt (round-5 verdict ask #2).

The round-4 latency sweep measured CHIP time (55 us/question at B=1 on
original-fp via device-side differencing); the serving docs must also own
the WALL number a real client pays through the relay. This driver runs the
actual serve.py CLI as a subprocess on the real TPU and measures, per
bucket:

- interactive B=1: send one request, wait for its answer, repeat N times —
  client wall per request (median / p90) + the server's own latency_ms
  (predict-call wall, incl. relay round-trip);
- burst B=max: write `burst` lines at once, wall until all answers return.

Usage (real chip):
  PYTHONPATH=/root/.axon_site JAX_PLATFORMS=axon python scripts/serve_latency_r5.py \
      --checkpoint results/int8_eval_r4/wide-fp_epoch091_weights_dicts.pkl \
      --model wide-fp --fixture /tmp/fx_serve --out results/serve_latency_r5/widefp_bf16.json
Add --rl-impl pallas_int8 for the int8 serving row.
"""

from __future__ import annotations

import argparse
import json
import os
import select
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _requests(fixture: str, n: int):
    with open(os.path.join(fixture, "questions", "CLEVR_val_questions.json")) as f:
        qs = json.load(f)["questions"]
    out = []
    for q in qs:
        img = os.path.join(fixture, "images", "val", q["image_filename"])
        out.append({"image": img, "question": q["question"]})
        if len(out) == n:
            break
    assert len(out) == n, f"fixture has only {len(out)} val questions, need {n}"
    return out


class _LineReader:
    """Raw-fd line reader: select() + os.read with own buffering.

    proc.stdout.readline() slurps every available byte into Python's
    read-ahead buffer, after which select() on the fd reports it empty —
    when the server emits a burst of answers in one batch, the second
    _read_line would time out with the data already sitting in the buffer
    (the exact bug serve.py's iter_microbatches fixes on the server side)."""

    def __init__(self, stream):
        self.fd = stream.fileno()
        self.buf = b""

    def read_line(self, timeout=300.0) -> str:
        """One non-empty stdout line from the server, with a hard timeout."""
        deadline = time.monotonic() + timeout
        while True:
            while b"\n" in self.buf:
                raw, self.buf = self.buf.split(b"\n", 1)
                if raw.strip():
                    return raw.decode()
            left = deadline - time.monotonic()
            if left <= 0:
                raise TimeoutError("no server response within timeout")
            r, _, _ = select.select([self.fd], [], [], min(left, 1.0))
            if r:
                chunk = os.read(self.fd, 1 << 16)
                if not chunk:
                    raise RuntimeError("server closed stdout")
                self.buf += chunk


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--model", required=True)
    ap.add_argument("--fixture", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--rl-impl", default=None)
    ap.add_argument("--max-batch", type=int, default=128)
    ap.add_argument("--n-single", type=int, default=30)
    ap.add_argument("--burst", type=int, default=128)
    args = ap.parse_args()

    cmd = [
        sys.executable, os.path.join(REPO, "serve.py"),
        "--model", args.model,
        "--checkpoint", args.checkpoint,
        "--batch-size", str(args.max_batch),
    ]
    if args.rl_impl:
        cmd += ["--rl-impl", args.rl_impl]
    proc = subprocess.Popen(
        cmd, cwd=REPO,
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, bufsize=1,
    )
    # wait for warmup: the "ready:" banner lands on stderr after all buckets
    # compile (remote compiles on the relay take minutes for wide models)
    t0 = time.monotonic()
    banner = ""
    while "ready:" not in banner:
        line = proc.stderr.readline()
        if not line:
            raise RuntimeError(
                "server died before ready: " + proc.stderr.read()[-2000:]
            )
        banner = line
    warmup_s = time.monotonic() - t0
    print(f"server ready in {warmup_s:.1f}s: {banner.strip()}", flush=True)
    reader = _LineReader(proc.stdout)

    reqs = _requests(args.fixture, max(args.n_single, args.burst))

    # ---- interactive B=1 ----
    singles_wall, singles_server = [], []
    for i in range(args.n_single):
        t0 = time.monotonic()
        proc.stdin.write(json.dumps(reqs[i]) + "\n")
        proc.stdin.flush()
        res = json.loads(reader.read_line())
        wall = time.monotonic() - t0
        assert "answer" in res, res
        assert res["bucket"] == 1, f"B=1 request routed to bucket {res['bucket']}"
        singles_wall.append(wall * 1e3)
        singles_server.append(res["latency_ms"])
    singles_wall_sorted = sorted(singles_wall)

    # ---- burst B=burst ----
    t0 = time.monotonic()
    proc.stdin.write("".join(json.dumps(r) + "\n" for r in reqs[: args.burst]))
    proc.stdin.flush()
    burst_res = [json.loads(reader.read_line()) for _ in range(args.burst)]
    burst_wall = time.monotonic() - t0
    buckets_used = sorted({r["bucket"] for r in burst_res})
    assert all("answer" in r for r in burst_res)

    proc.stdin.close()
    proc.wait(timeout=60)

    out = {
        "model": args.model,
        "rl_impl": args.rl_impl or "default",
        "checkpoint": args.checkpoint,
        "max_batch": args.max_batch,
        "warmup_s": round(warmup_s, 1),
        "b1": {
            "n": args.n_single,
            "wall_ms_median": round(statistics.median(singles_wall), 2),
            "wall_ms_p90": round(
                singles_wall_sorted[int(0.9 * len(singles_wall_sorted))], 2
            ),
            "server_latency_ms_median": round(
                statistics.median(singles_server), 2
            ),
        },
        "burst": {
            "n": args.burst,
            "total_wall_ms": round(burst_wall * 1e3, 2),
            "wall_ms_per_question": round(burst_wall * 1e3 / args.burst, 3),
            "buckets_used": buckets_used,
        },
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
