"""Checkpoint/resume via orbax: params + opt state + step + RNG.

Reference parity (SURVEY.md section 5 "Checkpoint / resume"): the reference
saves a weights-only state_dict per epoch (``model/{name}_epoch_N.pth``) and
``--resume PATH`` restores it (Adam moments restart). We keep that contract —
per-epoch saves, resume flag — but save the FULL train state (params, batch
stats, optimizer moments, step, RNG key) so resume is exact; a weights-only
export mirrors the reference's artifact shape for interchange.
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .steps import TrainState


class CheckpointManager:
    """Per-epoch orbax saves under <dir>/<name>_epoch_<N>/ + resume.

    keep=0 (default) retains EVERY per-epoch checkpoint, matching the
    reference (SURVEY.md section 5: save per epoch, resume any — the
    "pick the best epoch" eval workflow needs old epochs to survive).
    keep=N>0 opts into garbage-collecting all but the newest N
    (``--keep-checkpoints`` on the train CLI).
    """

    def __init__(self, directory: str, model_name: str, keep: int = 0):
        self.directory = os.path.abspath(directory)
        self.model_name = model_name
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()
        self.keep = keep

    def _path(self, epoch: int) -> str:
        return os.path.join(self.directory, f"{self.model_name}_epoch_{epoch:03d}")

    def save(self, state: TrainState, epoch: int) -> str:
        path = self._path(epoch)
        self._ckpt.save(path, state, force=True)
        self._ckpt.wait_until_finished()
        self._gc(epoch)
        return path

    def _gc(self, latest: int) -> None:
        if self.keep <= 0:
            return
        import re
        import shutil

        pat = re.compile(rf"^{re.escape(self.model_name)}_epoch_(\d+)$")
        epochs = sorted(
            int(m.group(1))
            for f in os.listdir(self.directory)
            if (m := pat.match(f))
        )
        for e in epochs[: -self.keep]:
            shutil.rmtree(self._path(e), ignore_errors=True)

    def latest_epoch(self) -> Optional[int]:
        import re

        pat = re.compile(rf"^{re.escape(self.model_name)}_epoch_(\d+)$")
        epochs = [
            int(m.group(1))
            for f in os.listdir(self.directory)
            if (m := pat.match(f))
        ]
        return max(epochs) if epochs else None

    def _resolve(self, path_or_epoch) -> str:
        return (
            self._path(path_or_epoch)
            if isinstance(path_or_epoch, int)
            else os.path.abspath(path_or_epoch)
        )

    def restore(self, target: TrainState, path_or_epoch) -> TrainState:
        """Restore from an explicit path or an epoch number (reference --resume)."""
        return self._ckpt.restore(self._resolve(path_or_epoch), target)

    def restore_weights(self, target: TrainState, path_or_epoch) -> TrainState:
        """Restore params/batch_stats only (inference/extraction: the saved
        optimizer tree may differ from the skeleton's and is not needed)."""
        restored = self._ckpt.restore(self._resolve(path_or_epoch))
        return target.replace(
            params=restored["params"],
            batch_stats=restored.get("batch_stats", target.batch_stats),
        )


def export_weights(state: TrainState, path: str) -> None:
    """Weights-only pickle export (reference state_dict artifact analogue)."""
    flat = jax.tree.map(np.asarray, {"params": state.params, "batch_stats": state.batch_stats})
    with open(path, "wb") as f:
        pickle.dump(flat, f)


def import_weights(state: TrainState, path: str) -> TrainState:
    with open(path, "rb") as f:
        flat = pickle.load(f)

    def _like(new, old):
        return jax.tree.map(lambda n, o: np.asarray(n, dtype=o.dtype), new, old)

    return state.replace(
        params=_like(flat["params"], state.params),
        batch_stats=_like(flat.get("batch_stats", state.batch_stats), state.batch_stats),
    )
