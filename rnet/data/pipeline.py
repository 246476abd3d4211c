"""Host input pipeline: threaded decode -> fixed-shape batches -> device prefetch.

TPU-native replacement for the reference's ``DataLoader(num_workers=N)`` +
``collate_samples`` + ``load_tensor_data`` stack (SURVEY.md sections 2.6/2.8):

  * PIL decode/augment + tokenize run in a thread pool (PIL releases the GIL
    around decode/resize), assembling **static-shape** numpy batches — jit
    wants static shapes, so questions/objects are padded to config maxima
    rather than batch maxima (parity note in SURVEY.md section 7 "Hard parts").
  * question inversion happens here (reference: load_tensor_data invert flag).
  * `prefetch_to_device` double-buffers jax.device_put so H2D overlaps compute,
    and can place batches directly as sharded global arrays over a Mesh.
"""

from __future__ import annotations

import collections
import random
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, Optional

import numpy as np

from .vocab import invert_questions


def _stack(items, key):
    return np.stack([it[key] for it in items], axis=0)


class BatchIterator:
    """Yield fixed-shape numpy batches from a dataset.

    For ``drop_last=False`` (eval), the final short batch is padded by
    repeating sample 0 and a boolean ``valid`` mask marks real rows, so
    accuracy can be computed exactly with static shapes.
    """

    def __init__(
        self,
        dataset: Any,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        epoch: int = 0,
        drop_last: bool = True,
        invert: bool = True,
        num_threads: int = 8,
        shard: tuple[int, int] = (0, 1),  # (process rank, world): multi-host
    ):
        self.ds = dataset
        self.bs = batch_size  # per-process batch size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = epoch
        self.drop_last = drop_last
        self.invert = invert
        self.num_threads = num_threads
        self.shard = shard

    def __len__(self) -> int:
        # identical batch count on every process (multi-host lockstep):
        # drop_last floors on the smallest local shard, else ceils on the
        # largest; short/missing tails are padded in __iter__.
        _, world = self.shard
        n = len(self.ds)
        n_min, n_max = n // world, -(-n // world)
        return n_min // self.bs if self.drop_last else -(-n_max // self.bs)

    def _get(self, i: int) -> Dict[str, np.ndarray]:
        # Deterministic per-(seed, epoch, item) augmentation RNG.
        rng = random.Random((self.seed * 1_000_003 + self.epoch) * 1_000_003 + i)
        return self.ds.__getitem__(i, rng=rng)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.ds)
        order = list(range(n))
        if self.shuffle:
            # identical global shuffle on every process, then strided shard —
            # each sample visits exactly one host per epoch.
            random.Random((self.seed, self.epoch).__hash__()).shuffle(order)
        rank, world = self.shard
        if world > 1:
            order = order[rank::world]
        nb = len(self)
        vectorized = hasattr(self.ds, "get_batch")
        with ThreadPoolExecutor(self.num_threads) as pool:
            for b in range(nb):
                idxs = order[b * self.bs : (b + 1) * self.bs]
                valid = np.zeros((self.bs,), dtype=bool)
                valid[: len(idxs)] = True
                while len(idxs) < self.bs:  # pad short final batch
                    idxs.append(order[0] if order else 0)
                if vectorized:
                    rng = random.Random(
                        (self.seed * 1_000_003 + self.epoch) * 1_000_003 + b
                    )
                    batch = dict(self.ds.get_batch(idxs, rng=rng))
                else:
                    items = list(pool.map(self._get, idxs))
                    batch = {key: _stack(items, key) for key in items[0]}
                if self.invert and "question" in batch:
                    batch["question"] = invert_questions(batch["question"])
                if not self.drop_last:
                    batch["valid"] = valid
                    # dataset-relative sample indices: lets eval reporting map
                    # predictions back to question metadata (category table)
                    batch["index"] = np.asarray(idxs, dtype=np.int32)
                yield batch


def prefetch_to_device(
    it: Iterator[Dict[str, np.ndarray]],
    sharding: Optional[Any] = None,
    buffer_size: int = 2,
) -> Iterator[Dict[str, Any]]:
    """Double-buffered device placement; optionally shards batches over a Mesh.

    With a NamedSharding whose first axis is the data mesh axis, the host
    batch is split across chips directly (the pjit data-parallel feed). In
    multi-host runs each process holds only its local slice of the global
    batch (the iterator shards sample order per process), so placement goes
    through make_array_from_process_local_data — a plain device_put with a
    global sharding would silently misread the local slice as the global
    batch.
    """
    import jax

    def place(batch):
        if sharding is None:
            return jax.device_put(batch)
        multihost = jax.process_count() > 1
        def put(x):
            s = _shard_for(sharding, x)
            if multihost:
                return jax.make_array_from_process_local_data(s, x)
            return jax.device_put(x, s)
        return jax.tree.map(put, batch)

    def _shard_for(s, x):
        # Rank-adjust a NamedSharding spec to the array's rank (batch dim only).
        import jax.sharding as js

        if isinstance(s, js.NamedSharding):
            spec = list(s.spec) + [None] * (x.ndim - len(s.spec))
            return js.NamedSharding(s.mesh, js.PartitionSpec(*spec[: x.ndim]))
        return s

    q: collections.deque = collections.deque()
    for batch in it:
        q.append(place(batch))
        if len(q) > buffer_size - 1:
            yield q.popleft()
    while q:
        yield q.popleft()
