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
        keep_checkpoints: int = 0,
        log_interval: int = 10,
        log_fn=print,
        tb_dir: Optional[str] = None,
        profile_dir: Optional[str] = None,
        profile_epoch: int = 1,
        device_data: bool = False,
        watchdog=None,
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
        # heartbeat for the stall watchdog (rnet/utils/watchdog.py): touched
        # at every host-visible progress point so a hung relay call — the
        # only thing that stops the beats — is detected and the process is
        # restarted by the supervisor with --resume latest
        self._beat = watchdog.beat if watchdog is not None else (lambda: None)

        self.mesh = pmesh.make_mesh(mesh_spec)
        self.model = RN(cfg=cfg, vocab_size=vocab_size)
        self.optimizer = make_injected_optimizer(lr.base, clip_norm, weight_decay)
        self.jit_train, self.jit_eval = make_jitted_steps(
            self.model, cfg, self.optimizer
        )
        self.ckpt = CheckpointManager(
            checkpoint_dir, cfg.name, keep=keep_checkpoints, dicts=dicts
        )

        # device-resident image caches (serve_indices datasets): the decoded
        # padded uint8 images live in HBM once; batches carry only indices.
        def _device_cache(ds, train: bool):
            if getattr(ds, "serve_indices", False):
                imgs = np.asarray(ds.images)
                if (
                    train
                    and not cfg.state_description
                    and cfg.device_augment
                    and imgs.ndim == 4
                    and imgs.shape[1] > cfg.image_size
                ):
                    # store the TRAIN canvas in the lane-padded flat form the
                    # DMA-gather augment kernel reads directly — padding
                    # in-jit would duplicate a multi-GB cache in HBM. The val
                    # cache stays 4-D: eval never enters the augment kernel,
                    # and flat rows would move 512 padded lanes per 432 used
                    # (~18% extra HBM gather traffic) just to unflatten in-jit.
                    from ..kernels.augment import pad_flat_cache

                    imgs = pad_flat_cache(imgs)
                return pmesh.put_global_chunked(
                    imgs, pmesh.replicated(self.mesh), beat=self._beat
                )
            return None

        self.train_cache = _device_cache(train_ds, train=True)
        self._beat()  # init beats: each heavy stage restarts the stall clock,
        # so --stall-timeout bounds the longest single init step (one cache
        # upload, one compile), not the whole init — otherwise a
        # longer-than-timeout init would loop restarts forever without ever
        # reaching a training step
        self.val_cache = (
            self.train_cache if val_ds is train_ds else _device_cache(val_ds, train=False)
        )
        self._beat()

        # device-resident per-question data + chunked multi-step dispatch:
        # the whole epoch's tokens/answers/(objects|image indices) live in
        # HBM and each jit call runs log_interval steps over an index block
        # (see steps.make_chunked_steps). Multi-host: every process loads the
        # same dataset files and the same seeded permutations, so the global
        # arrays/index blocks assemble without cross-host traffic
        # (pmesh.put_global) and results come back via fetch_global.
        self.train_data = self.val_data = None
        if (
            device_data
            and hasattr(train_ds, "device_arrays")
            and train_ds.device_arrays() is not None
        ):
            from ..data.vocab import invert_questions
            from .steps import make_chunked_steps

            self.jit_train_chunk, self.jit_eval_chunk = make_chunked_steps(
                self.model, cfg, self.optimizer
            )

            def _prep(ds):
                arrs = dict(ds.device_arrays())
                if self.invert:
                    arrs["question"] = invert_questions(arrs["question"])
                repl = pmesh.replicated(self.mesh)
                return {k: pmesh.put_global(v, repl) for k, v in arrs.items()}

            self.train_data = _prep(train_ds)
            self._beat()
            self.val_data = (
                self.train_data if val_ds is train_ds else _prep(val_ds)
            )
            self._beat()

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
                self.model, cfg, self.optimizer, jax.random.key(seed), sample,
                image_cache=self.train_cache,
            ),
            self.mesh,
        )
        self._beat()  # state init (first device dispatch) done
        self.epoch = 0
        self.history: list[Dict[str, float]] = []

        from ..utils.profiling import ScalarWriter

        self.scalars = ScalarWriter(tb_dir)
        self.profile_dir = profile_dir
        self.profile_epoch = profile_epoch

    # ---- resume ----

    def restore_weights(self, path_or_epoch) -> int:
        """params/batch_stats only (eval/inference; optimizer tree ignored)."""
        self.state = pmesh.replicate_state(
            self.ckpt.restore_weights(
                jax.tree.map(np.asarray, self.state), path_or_epoch
            ),
            self.mesh,
        )
        self.epoch = self._epoch_of(path_or_epoch)
        return self.epoch

    def _epoch_of(self, path_or_epoch) -> int:
        if isinstance(path_or_epoch, int):
            return path_or_epoch
        import re

        m = re.search(r"_epoch_(\d+)", str(path_or_epoch))
        return int(m.group(1)) if m else 0

    def resume(self, path_or_epoch) -> int:
        self.state = pmesh.replicate_state(
            self.ckpt.restore(
                jax.tree.map(np.asarray, self.state), path_or_epoch
            ),
            self.mesh,
        )
        self.epoch = self._epoch_of(path_or_epoch)
        return self.epoch

    # ---- diagnostics ----

    def int8_clip_report(self, batch_size: int = 64) -> np.ndarray:
        """Per-layer int8 calibration clip fractions on one live val batch
        (RN.int8_clip_report; printed by test.py under --rl-impl pallas_int8
        so calibration drift is visible, not silent)."""
        from ..models import RN
        from .steps import _inputs_of

        b = next(
            iter(
                BatchIterator(
                    self.val_ds,
                    min(batch_size, len(self.val_ds)),
                    shuffle=False,
                    invert=self.invert,
                )
            )
        )
        b = jax.tree.map(jnp.asarray, b)
        inputs = _inputs_of(b, self.cfg, self.val_cache)
        variables = {"params": self.state.params, "batch_stats": self.state.batch_stats}
        fr = self.model.apply(
            variables, inputs, b["question"], method=RN.int8_clip_report
        )
        return np.asarray(jax.device_get(fr))

    # ---- epochs ----

    def _val_categories(self):
        """Per-question category ids for reference-style family reporting."""
        fn = getattr(self.val_ds, "question_categories", None)
        return fn() if fn is not None else None

    def _idx_sharding(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        return NamedSharding(self.mesh, P(None, "data"))

    def _train_epoch_device(self, epoch: int, lr: float, bs: int) -> Dict[str, float]:
        """Epoch over device-resident data: K-step chunks, one dispatch each."""
        n = len(self.train_ds)
        nb = n // bs
        order = (
            np.random.RandomState((self.seed * 1_000_003 + epoch) % (2**31))
            .permutation(n)[: nb * bs]
            .astype(np.int32)
            .reshape(nb, bs)
        )
        C = max(1, self.log_interval)
        t0 = time.time()
        all_ms = []
        from ..utils.profiling import profile_trace

        prof_dir = self.profile_dir if epoch == self.profile_epoch else None
        # host-side step counter: reading self.state.step inside _drain would
        # block on the just-dispatched chunk's output (killing the one-chunk
        # fetch lag) and would stamp chunk k's metrics with chunk k+1's step
        step0 = int(self.state.step)

        def _drain(pending):
            # fetch the PREVIOUS chunk's metrics after dispatching the next:
            # the ~0.1-0.2 s relay round-trip overlaps the next chunk's compute
            # (one-chunk lag keeps the dispatch queue shallow, see CLAUDE.md)
            ms, done = pending
            ms = pmesh.fetch_global(ms)
            all_ms.append(ms)
            self.log(
                f"Train Epoch: {epoch} [{done}/{nb}] "
                f"Loss: {ms[-1, 0]:.4f} Acc: {ms[-1, 1]:.3f} LR: {lr:.2e} BS: {bs}"
            )
            self.scalars.write(
                step0 + done,
                {"train/loss": float(ms[-1, 0]), "train/accuracy": float(ms[-1, 1]),
                 "train/grad_norm": float(ms[-1, 2]), "train/lr": lr},
            )
            self._beat()

        pending = None
        with self.mesh, pmesh.pair_sharding(self.mesh), profile_trace(prof_dir):
            for c0 in range(0, nb, C):
                idx = pmesh.put_global(order[c0 : c0 + C], self._idx_sharding())
                self.state, ms = self.jit_train_chunk(
                    self.state, idx, self.train_data, self.train_cache
                )
                if pending is not None:
                    _drain(pending)
                pending = (ms, min(c0 + C, nb))
            if pending is not None:
                _drain(pending)
        ms = np.concatenate(all_ms, axis=0)
        dt = time.time() - t0
        return {
            "epoch": epoch,
            "train_loss": float(ms[:, 0].mean()),
            "train_acc": float(ms[:, 1].mean()),
            "lr": lr,
            "batch_size": bs,
            "sec": dt,
            "qps": nb * bs / dt if dt > 0 else 0.0,
        }

    def _eval_epoch_device(self, epoch: int, bs: int) -> Dict[str, float]:
        n = len(self.val_ds)
        nb = -(-n // bs)
        idx = np.zeros((nb * bs,), np.int32)
        idx[:n] = np.arange(n, dtype=np.int32)
        valid = np.zeros((nb * bs,), bool)
        valid[:n] = True
        idx = idx.reshape(nb, bs)
        valid = valid.reshape(nb, bs)
        acc = EvalAccumulator(self.dicts, categories=self._val_categories())
        t0 = time.time()

        # ONE dispatch for the whole epoch: eval (unlike training) has no
        # donated state chain to drain, so the scan runs all nb steps in a
        # single program and the host pays exactly one idx/valid upload and
        # one packed fetch — a relay round-trip is ~30 ms, so per-chunk
        # dispatch cost the old chunked loop 3+ round-trips per log_interval
        # steps (measured: scripts/bench_eval_breakdown.py, RESULTS.md).
        with self.mesh, pmesh.pair_sharding(self.mesh):
            sh = self._idx_sharding()
            outs = self.jit_eval_chunk(
                self.state,
                pmesh.put_global(idx, sh),
                pmesh.put_global(valid, sh),
                self.val_data,
                self.val_cache,
            )
            if isinstance(outs, tuple):  # >=256-answer configs: 4-array form
                pred, label, vld, nll_a = (pmesh.fetch_global(o) for o in outs)
                nll = float(nll_a.sum())
            else:
                from .steps import unpack_eval_chunk

                pred, label, vld, nll = unpack_eval_chunk(pmesh.fetch_global(outs))
            acc.update(pred.ravel(), label.ravel(), vld.ravel(), nll, qidx=idx.ravel())
        dt = time.time() - t0
        self.log(
            f"Eval Epoch: {epoch} accuracy: {acc.accuracy:.4f} "
            f"nll: {acc.mean_nll:.4f} ({n / dt:.0f} q/s)"
        )
        self._beat()
        return {
            "epoch": epoch,
            "val_acc": acc.accuracy,
            "val_nll": acc.mean_nll,
            "val_qps": n / dt if dt > 0 else 0.0,
            "_accumulator": acc,
        }

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        cfg = self.cfg
        lr = self.lr_sched.value(epoch)
        bs = self.bs_sched.int_value(epoch)
        bs = max(self.mesh.devices.size, (bs // self.mesh.devices.size) * self.mesh.devices.size)
        prev_bs = getattr(self, "_last_bs", None)
        if prev_bs is not None and bs != prev_bs:
            # make the schedule event auditable in the stdout receipt
            # (SURVEY.md 3.1 "REBUILD the DataLoader"; each BS phase is a
            # fresh static shape -> one recompile, cached per phase)
            self.log(
                f"BS schedule: {prev_bs} -> {bs} at epoch {epoch} "
                f"(new static batch shape; compiling this phase's step)"
            )
        self._last_bs = bs
        self.state = set_learning_rate(self.state, lr)
        if self.train_data is not None:
            return self._train_epoch_device(epoch, lr, bs)
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
                self.state, metrics = self.jit_train(self.state, batch, self.train_cache)
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
                    self._beat()
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
        if self.val_data is not None:
            bs = max(self.mesh.devices.size, (bs // self.mesh.devices.size) * self.mesh.devices.size)
            return self._eval_epoch_device(epoch, bs)
        bs = max(self.mesh.devices.size, (bs // self.mesh.devices.size) * self.mesh.devices.size)
        acc = EvalAccumulator(self.dicts, categories=self._val_categories())
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
                out = self.jit_eval(self.state, batch, self.val_cache)
                if world > 1:  # gather globally-sharded results on every host
                    from jax.experimental import multihost_utils

                    def _gather(x):
                        if getattr(x, "ndim", 0) == 0:
                            # replicated scalar (nll_sum): every host already
                            # holds the global value; fetch the local shard
                            return np.asarray(jax.device_get(x.addressable_data(0)))
                        # (B,) arrays sharded over 'data' across hosts: tiled
                        # allgather reassembles the global batch on every host
                        return np.asarray(
                            multihost_utils.process_allgather(x, tiled=True)
                        )

                    out = jax.tree.map(_gather, out)
                out = jax.tree.map(np.asarray, out)
                acc.update(
                    out["pred"],
                    out["label"],
                    out["valid"],
                    out["nll_sum"],
                    qidx=out.get("index"),
                )
                n += int(out["valid"].sum())
        dt = time.time() - t0
        self.log(
            f"Eval Epoch: {epoch} accuracy: {acc.accuracy:.4f} "
            f"nll: {acc.mean_nll:.4f} ({n / dt:.0f} q/s)"
        )
        self._beat()
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
                self._beat()
            self.epoch = epoch
            self.history.append(stats)
        return self.history
