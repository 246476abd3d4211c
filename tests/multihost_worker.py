"""Worker process for tests/test_multihost.py.

Runs the REAL training stack — Trainer, BatchIterator process shards,
make_array_from_process_local_data batch placement, GSPMD train step over a
global 8-device mesh, process_allgather eval — as one process of a
2-process jax.distributed world (4 virtual CPU devices per process, loopback
coordinator, gloo CPU collectives). Also runnable with --world 1 as the
single-process comparison topology (8 local devices).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, required=True)
    ap.add_argument("--world", type=int, required=True)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--clevr-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--pipeline", choices=("standard", "device"), default="standard")
    ap.add_argument(
        "--mesh",
        default="data:8",
        help="global mesh spec; 'data:4,pairs:2' exercises the pair-axis "
        "sharding (GSPMD constraint path) across process boundaries",
    )
    args = ap.parse_args()

    if args.world == 1:  # comparison topology: one process, 8 local devices
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from rnet.parallel.mesh import distributed_init

    if args.world > 1:
        distributed_init(
            coordinator_address=args.coordinator,
            num_processes=args.world,
            process_id=args.rank,
        )
    assert jax.process_count() == args.world
    assert jax.device_count() == 8

    import numpy as np

    from rnet.config import load_config
    from rnet.data.clevr import ClevrDatasetStateDescription
    from rnet.data.vocab import build_dictionaries
    from rnet.train.loop import Trainer
    from rnet.train.schedules import DoublingSchedule

    cfg = load_config(
        "original-sd",
        overrides={
            "g_layers": (64, 64),
            "f_layers": (64,),
            "lstm_word_emb": 8,
            "lstm_hidden": 16,
            "question_max_len": 16,
            "dropout": 0.0,  # permutation-invariance needs dropout off
            "rl_impl": "xla",
            "compute_dtype": "float32",
        },
    )
    dicts = build_dictionaries(args.clevr_dir)

    def truncated(split, n):
        ds = ClevrDatasetStateDescription(
            args.clevr_dir, split, dicts,
            max_objects=cfg.max_objects, object_dim=cfg.object_dim,
            question_max_len=cfg.question_max_len,
        )
        ds.questions = ds.questions[:n]
        for f in ("_objects", "_n_objects", "_tokens", "_answers"):
            setattr(ds, f, getattr(ds, f)[:n])
        return ds

    # global batch == full train split: the multi-host shard is then a row
    # permutation of the single-process batch (see test docstring)
    train_ds, val_ds = truncated("train", 16), truncated("val", 8)

    trainer = Trainer(
        cfg,
        vocab_size=dicts.vocab_size,
        train_ds=train_ds,
        val_ds=val_ds,
        dicts=dicts,
        lr=DoublingSchedule(1e-3, gamma=1.0),
        bs=DoublingSchedule(16, gamma=1.0),
        seed=7,
        mesh_spec=args.mesh,
        checkpoint_dir=os.path.join(os.path.dirname(args.out), f"ck{args.rank}"),
        log_interval=1,
        log_fn=lambda *a: None,
        device_data=(args.pipeline == "device"),
    )
    if args.pipeline == "device":
        assert trainer.train_data is not None, "device pipeline did not engage"
    history = trainer.fit(epochs=2, eval_every=2, save_every=0)
    last = history[-1]

    params = jax.tree.map(np.asarray, trainer.state.params)
    digest = float(sum(np.abs(leaf).sum() for leaf in jax.tree.leaves(params)))

    with open(args.out, "w") as f:
        json.dump(
            {
                "process_count": jax.process_count(),
                "global_devices": jax.device_count(),
                "train_loss": last["train_loss"],
                "val_acc": last["val_acc"],
                "val_nll": last["val_nll"],
                "param_digest": digest,
                "n_train_batches": int(trainer.state.step),
            },
            f,
        )
    print(f"rank {args.rank}/{args.world} done: {last}", flush=True)


if __name__ == "__main__":
    main()
