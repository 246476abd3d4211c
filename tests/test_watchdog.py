"""Stall watchdog + supervised auto-restart (rnet/utils/watchdog.py).

The reference's recovery contract is per-epoch checkpoints + manual --resume
(SURVEY.md section 5, failure detection/recovery); the watchdog automates the
operator's kill-and-resume for the relay-hang failure mode this backend has
shown twice (rounds 3-4). These tests pin: firing semantics, beat semantics,
the restart command rewrite, the supervisor's retry/give-up policy, and the
end-to-end stall exit of a real child process.
"""

from __future__ import annotations

import subprocess
import sys
import time

import pytest

from rnet.utils.watchdog import (
    EXIT_STALL,
    Watchdog,
    strip_flag,
    supervise,
    with_resume_latest,
)


def test_watchdog_fires_on_silence():
    fired = []
    wd = Watchdog(0.15, on_stall=lambda idle: fired.append(idle), poll=0.02)
    with wd:
        time.sleep(0.6)
    assert wd.fired and fired and fired[0] >= 0.15


def test_watchdog_beats_prevent_firing():
    fired = []
    wd = Watchdog(0.2, on_stall=lambda idle: fired.append(idle), poll=0.02)
    with wd:
        for _ in range(10):
            time.sleep(0.05)
            wd.beat()
    assert not fired and not wd.fired


def test_watchdog_rejects_nonpositive_timeout():
    with pytest.raises(ValueError):
        Watchdog(0.0)


def test_with_resume_latest_appends_and_replaces():
    assert with_resume_latest(["--epochs", "5"]) == [
        "--epochs", "5", "--resume", "latest",
    ]
    assert with_resume_latest(["--resume", "7", "--epochs", "5"]) == [
        "--resume", "latest", "--epochs", "5",
    ]
    assert with_resume_latest(["--epochs", "5", "--resume"]) == [
        "--epochs", "5", "--resume", "latest",
    ]


def test_strip_flag_removes_flag_and_value():
    argv = ["--auto-restart", "3", "--epochs", "5", "--auto-restart=9"]
    assert strip_flag(argv, "--auto-restart") == ["--epochs", "5"]


def test_supervise_restarts_on_stall_then_succeeds():
    calls = []
    rcs = iter([EXIT_STALL, EXIT_STALL, 0])

    def run(argv):
        calls.append(list(argv))
        return next(rcs)

    rc = supervise(["prog", "--epochs", "5"], max_restarts=5, run=run, log=lambda m: None)
    assert rc == 0
    assert len(calls) == 3
    # every relaunch resumes from the newest complete checkpoint
    assert calls[1][-2:] == ["--resume", "latest"]
    assert calls[2][-2:] == ["--resume", "latest"]
    assert calls[2].count("--resume") == 1  # idempotent rewrite


def test_supervise_exhausts_restart_budget():
    calls = []

    def run(argv):
        calls.append(list(argv))
        return EXIT_STALL

    rc = supervise(["prog"], max_restarts=2, run=run, log=lambda m: None)
    assert rc == EXIT_STALL and len(calls) == 3  # initial + 2 restarts


def test_supervise_never_retries_ordinary_failures():
    calls = []

    def run(argv):
        calls.append(list(argv))
        return 1

    assert supervise(["prog"], max_restarts=5, run=run, log=lambda m: None) == 1
    assert len(calls) == 1


def test_real_process_stall_exit():
    """A child whose 'training' wedges must exit EXIT_STALL via the watchdog."""
    code = (
        "import time\n"
        "from rnet.utils.watchdog import Watchdog\n"
        "Watchdog(0.3, poll=0.05).start()\n"
        "time.sleep(30)\n"  # wedged 'relay call'; watchdog must kill us
        "print('unreachable')\n"
    )
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=20,
        cwd=".",
    )
    assert proc.returncode == EXIT_STALL
    assert "WATCHDOG" in proc.stderr
    assert time.time() - t0 < 10  # killed promptly, not after the sleep


def test_stall_exit_flushes_buffered_stdout(tmp_path):
    """os._exit discards buffered stdout; the stall handler must flush first
    so the training log keeps every line up to the hang (a production stall
    ate the tail of the round-4 stretch-32 log)."""
    code = (
        "import sys, time\n"
        "from rnet.utils.watchdog import Watchdog\n"
        "print('progress-line-before-stall')\n"  # buffered: stdout is a pipe
        "Watchdog(0.3, poll=0.05).start()\n"
        "time.sleep(30)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=20
    )
    assert proc.returncode == EXIT_STALL
    assert "progress-line-before-stall" in proc.stdout


def test_supervise_child_env_is_unbuffered():
    captured = {}

    def fake_call(cmd, env=None):
        captured["env"] = env
        return 0

    import subprocess as sp
    orig = sp.call
    sp.call = fake_call
    try:
        supervise(["prog"], max_restarts=0)
    finally:
        sp.call = orig
    assert captured["env"]["PYTHONUNBUFFERED"] == "1"
