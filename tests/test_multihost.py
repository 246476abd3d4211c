"""Multi-host (2-process) data-parallel training over the DCN-analog path.

SURVEY.md 2.8: the reference is single-process DataParallel; our multi-host
story is jax.distributed over DCN with per-process data shards. Round 1 wrote
that path (mesh.distributed_init, pipeline.make_array_from_process_local_data,
loop process_allgather) but never executed it. This test runs it for real:
two OS processes, each with 4 virtual CPU devices, a loopback coordinator and
gloo CPU collectives, training the actual Trainer on a shared fixture — and
asserts metric parity with the identical single-process 8-device run.

Parity argument: the global batch equals the full (tiny) train split in both
topologies, so the multi-host strided shard is a row PERMUTATION of the
single-process batch; with dropout off, every step's mean loss/grads are
permutation-invariant, so the two runs agree to fp tolerance.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(
    fixture_dir, tmp_path, world: int, timeout=600, pipeline="standard",
    mesh="data:8",
):
    """Launch `world` worker processes (8//world virtual CPU devices each,
    so the global topology is always 8 devices and runs stay comparable)."""
    port = _free_port()
    tag = mesh.replace(":", "").replace(",", "-")
    outs = [tmp_path / f"mh_{pipeline}_{tag}_{world}_{r}.json" for r in range(world)]
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # drop the axon sitecustomize: CPU-only
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={8 // world}"
    procs = [
        subprocess.Popen(
            [
                sys.executable, WORKER,
                "--rank", str(r), "--world", str(world),
                "--coordinator", f"localhost:{port}",
                "--clevr-dir", str(fixture_dir), "--out", str(outs[r]),
                "--pipeline", pipeline, "--mesh", mesh,
            ],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for r in range(world)
    ]
    logs = [p.communicate(timeout=timeout)[0] for p in procs]
    for r, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {r}/{world} failed:\n{log[-4000:]}"
    return [json.loads(o.read_text()) for o in outs]


@pytest.mark.slow
def test_two_process_training_matches_single_process(fixture_dir, tmp_path):
    multi = _run_workers(fixture_dir, tmp_path, world=2)
    single = _run_workers(fixture_dir, tmp_path, world=1)

    # every process observed the same global world
    assert all(r["process_count"] == 2 for r in multi)
    assert all(r["global_devices"] == 8 for r in multi)
    assert single[0]["global_devices"] == 8

    # both ranks computed identical global metrics (the eval allgather ran)
    for key in ("train_loss", "val_acc", "val_nll"):
        assert multi[0][key] == pytest.approx(multi[1][key], abs=1e-5), key

    # 2-process run == 1-process run (same global batch as a set; dropout off)
    for key in ("train_loss", "val_acc", "val_nll"):
        assert multi[0][key] == pytest.approx(single[0][key], rel=2e-4, abs=2e-4), key

    # parameters stayed replicated and identical across hosts after 2 epochs
    assert multi[0]["param_digest"] == pytest.approx(
        multi[1]["param_digest"], rel=1e-6
    )
    assert multi[0]["param_digest"] == pytest.approx(
        single[0]["param_digest"], rel=1e-3
    )
    assert multi[0]["n_train_batches"] >= 2  # it actually stepped


@pytest.mark.slow
def test_four_process_training_matches_single_process(fixture_dir, tmp_path):
    """World size generalizes past 2: four processes x 2 virtual devices each
    (same 8-device global topology), gloo collectives among 4 ranks. Asserts
    cross-rank metric identity and parity with the single-process run."""
    multi = _run_workers(fixture_dir, tmp_path, world=4)
    single = _run_workers(fixture_dir, tmp_path, world=1)

    assert all(r["process_count"] == 4 for r in multi)
    assert all(r["global_devices"] == 8 for r in multi)

    for key in ("train_loss", "val_acc", "val_nll"):
        vals = [r[key] for r in multi]
        assert max(vals) - min(vals) < 1e-5, (key, vals)
        assert multi[0][key] == pytest.approx(single[0][key], rel=2e-4, abs=2e-4), key

    digests = [r["param_digest"] for r in multi]
    assert max(digests) - min(digests) <= abs(digests[0]) * 1e-6
    assert multi[0]["param_digest"] == pytest.approx(
        single[0]["param_digest"], rel=1e-3
    )
    assert multi[0]["n_train_batches"] >= 2


@pytest.mark.slow
def test_two_process_pairs_axis_matches_single_process(fixture_dir, tmp_path):
    """Multi-host x pairs-axis (round-4 verdict ask #7 — the last untested
    combination): a 2-process world over a GLOBAL 'data:4,pairs:2' mesh, so
    the O(n^2) pair-axis sharding constraint (TP-analog) spans the process
    boundary — each process holds one 'pairs' column slice of half the data
    rows, and the pair-sum reduction crosses the DCN-analog. Must match the
    identical single-process data:4,pairs:2 run (isolates the multi-process
    dimension; same reduction layout)."""
    multi = _run_workers(fixture_dir, tmp_path, world=2, mesh="data:4,pairs:2")
    single = _run_workers(fixture_dir, tmp_path, world=1, mesh="data:4,pairs:2")

    assert all(r["process_count"] == 2 for r in multi)
    assert all(r["global_devices"] == 8 for r in multi)

    for key in ("train_loss", "val_acc", "val_nll"):
        assert multi[0][key] == pytest.approx(multi[1][key], abs=1e-5), key
        assert multi[0][key] == pytest.approx(single[0][key], rel=2e-4, abs=2e-4), key

    assert multi[0]["param_digest"] == pytest.approx(
        multi[1]["param_digest"], rel=1e-6
    )
    assert multi[0]["param_digest"] == pytest.approx(
        single[0]["param_digest"], rel=1e-3
    )
    assert multi[0]["n_train_batches"] >= 2


@pytest.mark.slow
def test_two_process_device_pipeline_matches_single_process(fixture_dir, tmp_path):
    """Device-resident pipeline (HBM data + chunked dispatch) under multi-host:
    put_global assembles replicated data arrays and P(None,'data') index blocks
    across processes; fetch_global reassembles sharded eval outputs over the
    DCN-analog. The seeded epoch permutation is process-independent, so the
    2-process run must match the single-process 8-device run exactly (modulo
    reduction-layout fp noise)."""
    multi = _run_workers(fixture_dir, tmp_path, world=2, pipeline="device")
    single = _run_workers(fixture_dir, tmp_path, world=1, pipeline="device")

    assert all(r["process_count"] == 2 for r in multi)
    assert all(r["global_devices"] == 8 for r in multi)

    for key in ("train_loss", "val_acc", "val_nll"):
        assert multi[0][key] == pytest.approx(multi[1][key], abs=1e-5), key
        assert multi[0][key] == pytest.approx(single[0][key], rel=2e-4, abs=2e-4), key

    assert multi[0]["param_digest"] == pytest.approx(
        multi[1]["param_digest"], rel=1e-6
    )
    assert multi[0]["param_digest"] == pytest.approx(
        single[0]["param_digest"], rel=1e-3
    )
    assert multi[0]["n_train_batches"] >= 2
