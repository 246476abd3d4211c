"""Epoch loop: train -> eval -> checkpoint, with LR/BS doubling schedules.

Reference parity (SURVEY.md 3.1): per-epoch [maybe step LR x gamma until
lr_max; maybe grow batch size x gamma until bs_max and rebuild the loader],
hot batch loop (load -> step -> clip -> Adam -> periodic prints), eval pass,
per-epoch checkpoint. TPU-native: jitted fused step with donated state, mesh
data-parallelism, per-batch-size-phase compile caching.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


from ..config import ModelConfig
from ..data.pipeline import BatchIterator, prefetch_to_device
from ..eval.metrics import EvalAccumulator
from ..models import RN
from ..parallel import mesh as pmesh
from .checkpoint import CheckpointManager
from .schedules import DoublingSchedule
from .steps import TrainState, create_train_state, make_jitted_steps, make_optimizer


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Update the injected LR inside opt_state without recompiling."""
    opt_state = state.opt_state
    new_parts = []
    found = False
    for part in opt_state:
        if hasattr(part, "hyperparams") and "learning_rate" in part.hyperparams:
            hp = dict(part.hyperparams)
            hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
            part = part._replace(hyperparams=hp)
            found = True
        new_parts.append(part)
    if not found:
        raise ValueError("optimizer has no injected learning_rate hyperparam")
    return state.replace(opt_state=tuple(new_parts))


def make_injected_optimizer(lr: float, clip_norm: float, weight_decay: float = 0.0):
    """The trainer's optimizer: shared chain with recompile-free LR injection."""
    return make_optimizer(lr, clip_norm, weight_decay, inject_lr=True)


class Trainer:
    def __init__(
        self,
        cfg: ModelConfig,
        vocab_size: int,
        train_ds: Any,
        val_ds: Any,
        dicts: Any,
        *,
        lr: DoublingSchedule,
        bs: DoublingSchedule,
        clip_norm: float = 50.0,
        weight_decay: float = 0.0,
        seed: int = 42,
        invert: bool = True,
        num_threads: int = 8,
        mesh_spec: Optional[str] = None,
        checkpoint_dir: str = "model",
        log_interval: int = 10,
        log_fn=print,
        tb_dir: Optional[str] = None,
        profile_dir: Optional[str] = None,
        profile_epoch: int = 1,
    ):
        self.cfg = cfg
        self.dicts = dicts
        self.train_ds = train_ds
        self.val_ds = val_ds
        self.lr_sched = lr
        self.bs_sched = bs
        self.seed = seed
        self.invert = invert
        self.num_threads = num_threads
        self.log_interval = log_interval
        self.log = log_fn

        self.mesh = pmesh.make_mesh(mesh_spec)
        self.model = RN(cfg=cfg, vocab_size=vocab_size)
        self.optimizer = make_injected_optimizer(lr.base, clip_norm, weight_decay)
        self.jit_train, self.jit_eval = make_jitted_steps(
            self.model, cfg, self.optimizer
        )
        self.ckpt = CheckpointManager(checkpoint_dir, cfg.name)

        # init on a sample batch (static shapes fixed by config maxima)
        bs0 = bs.int_value(1)
        sample = next(
            iter(
                BatchIterator(
                    train_ds, min(bs0, len(train_ds)), shuffle=False, invert=invert
                )
            )
        )
        sample = jax.tree.map(jnp.asarray, sample)
        self.state = pmesh.replicate_state(
            create_train_state(
                self.model, cfg, self.optimizer, jax.random.key(seed), sample
            ),
            self.mesh,
        )
        self.epoch = 0
        self.history: list[Dict[str, float]] = []

        from ..utils.profiling import ScalarWriter

        self.scalars = ScalarWriter(tb_dir)
        self.profile_dir = profile_dir
        self.profile_epoch = profile_epoch

    # ---- resume ----

    def resume(self, path_or_epoch) -> int:
        self.state = pmesh.replicate_state(
            self.ckpt.restore(
                jax.tree.map(np.asarray, self.state), path_or_epoch
            ),
            self.mesh,
        )
        if isinstance(path_or_epoch, int):
            self.epoch = path_or_epoch
        else:  # parse trailing _epoch_NNN
            import re

            m = re.search(r"_epoch_(\d+)", str(path_or_epoch))
            self.epoch = int(m.group(1)) if m else 0
        return self.epoch

    # ---- epochs ----

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        cfg = self.cfg
        lr = self.lr_sched.value(epoch)
        bs = self.bs_sched.int_value(epoch)
        bs = max(self.mesh.devices.size, (bs // self.mesh.devices.size) * self.mesh.devices.size)
        self.state = set_learning_rate(self.state, lr)
        rank, world = jax.process_index(), jax.process_count()
        it = BatchIterator(
            self.train_ds,
            bs // world,  # per-process slice of the global batch
            shuffle=True,
            seed=self.seed,
            epoch=epoch,
            drop_last=True,
            invert=self.invert,
            num_threads=self.num_threads,
            shard=(rank, world),
        )
        n_batches = len(it)
        # per-step metrics stay on device (tiny scalars); fetched in one shot
        # at epoch end so the epoch mean covers EVERY step, while the periodic
        # log fetch doubles as the dispatch-queue drain.
        losses, accs = [], []
        t0 = time.time()
        n_seen = 0
        from ..utils.profiling import profile_trace

        prof_dir = self.profile_dir if epoch == self.profile_epoch else None
        with self.mesh, pmesh.pair_sharding(self.mesh), profile_trace(prof_dir):
            for i, batch in enumerate(
                prefetch_to_device(iter(it), pmesh.batch_sharding(self.mesh))
            ):
                self.state, metrics = self.jit_train(self.state, batch)
                n_seen += bs
                losses.append(metrics["loss"])
                accs.append(metrics["accuracy"])
                if (i + 1) % self.log_interval == 0 or i + 1 == n_batches:
                    loss = float(metrics["loss"])
                    acc = float(metrics["accuracy"])
                    self.log(
                        f"Train Epoch: {epoch} [{i + 1}/{n_batches}] "
                        f"Loss: {loss:.4f} Acc: {acc:.3f} LR: {lr:.2e} BS: {bs}"
                    )
                    self.scalars.write(
                        int(self.state.step),
                        {"train/loss": loss, "train/accuracy": acc,
                         "train/grad_norm": float(metrics["grad_norm"]),
                         "train/lr": lr},
                    )
        mean_loss = float(jnp.stack(losses).mean()) if losses else float("nan")
        mean_acc = float(jnp.stack(accs).mean()) if accs else float("nan")
        dt = time.time() - t0
        return {
            "epoch": epoch,
            "train_loss": mean_loss,
            "train_acc": mean_acc,
            "lr": lr,
            "batch_size": bs,
            "sec": dt,
            "qps": n_seen / dt if dt > 0 else 0.0,
        }

    def eval_epoch(self, epoch: int, batch_size: Optional[int] = None) -> Dict[str, float]:
        bs = batch_size or self.bs_sched.int_value(max(epoch, 1))
        bs = max(self.mesh.devices.size, (bs // self.mesh.devices.size) * self.mesh.devices.size)
        acc = EvalAccumulator(self.dicts)
        rank, world = jax.process_index(), jax.process_count()
        it = BatchIterator(
            self.val_ds,
            bs // world,
            shuffle=False,
            drop_last=False,
            invert=self.invert,
            num_threads=self.num_threads,
            shard=(rank, world),
        )
        t0 = time.time()
        n = 0
        with self.mesh, pmesh.pair_sharding(self.mesh):
            for batch in prefetch_to_device(iter(it), pmesh.batch_sharding(self.mesh)):
                out = self.jit_eval(self.state, batch)
                if world > 1:  # gather globally-sharded results on every host
                    from jax.experimental import multihost_utils

                    out = multihost_utils.process_allgather(out)
                out = jax.tree.map(np.asarray, out)
                acc.update(
                    out["pred"],
                    out["label"],
                    out["valid"],
                    out["nll_sum"],
                )
                n += int(out["valid"].sum())
        dt = time.time() - t0
        self.log(
            f"Eval Epoch: {epoch} accuracy: {acc.accuracy:.4f} "
            f"nll: {acc.mean_nll:.4f} ({n / dt:.0f} q/s)"
        )
        return {
            "epoch": epoch,
            "val_acc": acc.accuracy,
            "val_nll": acc.mean_nll,
            "val_qps": n / dt if dt > 0 else 0.0,
            "_accumulator": acc,
        }

    def fit(
        self,
        epochs: int,
        eval_every: int = 1,
        save_every: int = 1,
        results_dir: Optional[str] = None,
    ) -> list[Dict[str, float]]:
        for epoch in range(self.epoch + 1, epochs + 1):
            stats = self.train_epoch(epoch)
            if eval_every and epoch % eval_every == 0:
                estats = self.eval_epoch(epoch)
                acc = estats.pop("_accumulator")
                stats.update(estats)
                if results_dir:
                    acc.dump(results_dir, tag=f"val_epoch{epoch:03d}")
            if save_every and epoch % save_every == 0:
                self.ckpt.save(jax.tree.map(np.asarray, self.state), epoch)
            self.epoch = epoch
            self.history.append(stats)
        return self.history
