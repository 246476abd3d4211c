#!/usr/bin/env python
"""Epoch-scale wall-clock training benchmark: the device pipeline end to end.

Measures REAL wall-clock questions/sec over a CLEVR-train-sized epoch
(113k questions, 4000 distinct 144^2 images) through the actual Trainer
device pipeline: HBM-resident images + tokens, chunked multi-step dispatch,
fused Pallas gather+crop+rotate+normalize augmentation, pipelined metric
fetches. Epoch 1 pays the compiles; epochs 2+ are steady state.

This is the honest number the microbenchmarks must reconcile with
(RESULTS.md "Wall-clock end-to-end training").

Usage: PYTHONPATH=/root/.axon_site:. JAX_PLATFORMS=axon \
           python scripts/bench_epoch.py [n_questions] [log_interval] [augment_impl]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


class SyntheticDeviceDataset:
    """CachedClevrDataset-shaped in-memory dataset (serve_indices mode)."""

    serve_indices = True

    def __init__(self, n_images=4000, n_questions=113_000, size=144, max_len=48, seed=0):
        rs = np.random.RandomState(seed)
        self.images = rs.randint(0, 256, (n_images, size, size, 3), dtype=np.uint8)
        self._tokens = rs.randint(1, 80, (n_questions, max_len)).astype(np.int32)
        self._answers = rs.randint(0, 28, (n_questions,)).astype(np.int32)
        self._img_idx = rs.randint(0, n_images, (n_questions,)).astype(np.int32)

    def __len__(self):
        return len(self._tokens)

    def device_arrays(self):
        return {
            "question": self._tokens,
            "answer": self._answers,
            "image_idx": self._img_idx,
        }

    def get_batch(self, idxs, rng=None):
        idxs = np.asarray(idxs, dtype=np.int32)
        return {
            "image_idx": self._img_idx[idxs],
            "question": self._tokens[idxs],
            "answer": self._answers[idxs],
        }


def main():
    args = sys.argv[1:]
    n_q = int(args[0]) if len(args) > 0 else 113_000
    log_interval = int(args[1]) if len(args) > 1 else 40
    augment_impl = args[2] if len(args) > 2 else "auto"

    from rnet.config import load_config
    from rnet.data.vocab import Dictionaries
    from rnet.train.loop import Trainer
    from rnet.train.schedules import DoublingSchedule

    cfg = load_config(
        "original-fp",
        overrides={"device_augment": True, "augment_impl": augment_impl},
    )
    ds = SyntheticDeviceDataset(n_questions=n_q)
    dicts = Dictionaries(
        {f"w{i}": i for i in range(1, 90)}, {f"a{i}": i for i in range(28)}
    )
    trainer = Trainer(
        cfg, vocab_size=90, train_ds=ds, val_ds=ds, dicts=dicts,
        lr=DoublingSchedule(1e-4, gamma=1.0),
        bs=DoublingSchedule(512, gamma=1.0),
        checkpoint_dir="/tmp/bench_epoch_ckpt",
        log_interval=log_interval,
        log_fn=lambda *a: None,
        device_data=True,
    )
    assert trainer.train_data is not None, "device pipeline did not engage"
    stats1 = trainer.train_epoch(1)  # compiles
    rates = []
    for e in (2, 3):
        t0 = time.time()
        st = trainer.train_epoch(e)
        rates.append(st["qps"])
        print(
            f"epoch {e}: {st['qps']:.0f} q/s wall-clock "
            f"({st['sec']:.2f}s, {st['batch_size']} x {n_q // st['batch_size']} steps, "
            f"augment={augment_impl}, C={log_interval})",
            flush=True,
        )
    print(f"steady-state: {max(rates):.0f} questions/s wall-clock (epoch 1 incl. compiles: {stats1['qps']:.0f})")
    # eval wall-clock (pipelined chunk fetches; device pipeline, n_q questions)
    trainer.eval_epoch(1)  # compiles
    ev = max(trainer.eval_epoch(e)["val_qps"] for e in (2, 3))
    print(f"eval steady-state: {ev:.0f} questions/s wall-clock")


if __name__ == "__main__":
    main()
