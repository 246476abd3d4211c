"""Device mesh + sharding layout for data-parallel (and pair-parallel) training.

TPU-native replacement for the reference's ``nn.DataParallel`` (SURVEY.md 2.8):
  * 1-D/2-D `jax.sharding.Mesh` with axes ('data', 'pairs').
  * the batch is sharded over 'data'; parameters/optimizer state are
    replicated; jit's sharding propagation inserts the gradient allreduce
    (psum over ICI) — no hand-written collectives.
  * the optional 'pairs' axis shards the O(n^2) pair-activation axis of the
    relational core (the model's quadratic dimension — the sequence-parallel
    analogue per SURVEY.md section 5): a with_sharding_constraint on the
    (B, n^2, H) activations makes XLA partition the g matmul chain over chips
    and reduce the pair sum over ICI.

The same code runs on one chip (trivial mesh), a v5e-8 slice, or the 8-device
virtual CPU platform used by tests and the driver's multi-chip dry-run.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_state = threading.local()


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up over DCN (SURVEY.md 2.8: the reference is strictly
    single-process DataParallel; multi-slice here is jax.distributed over DCN
    with ICI collectives inside each slice).

    With no arguments, jax.distributed.initialize() reads the standard env
    (JAX_COORDINATOR_ADDRESS / cloud TPU metadata). No-op when already
    initialized or single-process.

    NOTE: the guard must NOT touch jax.process_count()/jax.devices() — those
    initialize the single-process backend, after which distributed init can
    never succeed (caught by tests/test_multihost.py).
    """
    import jax

    if jax.distributed.is_initialized():
        return
    if coordinator_address is not None:
        # explicit bring-up: failures are real errors, let them propagate
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return
    try:
        jax.distributed.initialize()  # env/metadata-configured, if any
    except (ValueError, RuntimeError):
        pass  # single-process / no coordinator configured


def make_mesh(spec: Optional[str] = None, devices=None) -> Mesh:
    """Build a mesh from a spec like "data:4" or "data:4,pairs:2".

    Default: all devices on the 'data' axis (pure DP, the reference-equivalent
    strategy).
    """
    devices = list(devices if devices is not None else jax.devices())
    if not spec:
        return Mesh(np.asarray(devices), ("data",))
    names, sizes = [], []
    for part in spec.split(","):
        name, _, size = part.partition(":")
        names.append(name.strip())
        sizes.append(int(size))
    total = int(np.prod(sizes))
    if total != len(devices):
        raise ValueError(
            f"mesh spec {spec!r} needs {total} devices, have {len(devices)}"
        )
    arr = np.asarray(devices).reshape(sizes)
    return Mesh(arr, tuple(names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays: sharded over 'data', replicated elsewhere."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Place a host batch as a global array sharded over 'data'.

    Single-process: a plain device_put split. Multi-host: each process holds
    its local slice of the global batch (the pipeline already shards the
    sample order per process) and the global array is assembled without any
    cross-host transfer.
    """
    multihost = jax.process_count() > 1

    def _put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        sh = NamedSharding(mesh, spec)
        if multihost:
            return jax.make_array_from_process_local_data(sh, x)
        return jax.device_put(x, sh)

    return jax.tree.map(_put, batch)


def replicate_state(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


def put_global(x, sharding: NamedSharding):
    """Place a host array that is IDENTICAL on every process as a global
    array with `sharding`. Single-process: plain device_put. Multi-host: each
    process materializes only its addressable shards (no cross-host traffic);
    callers guarantee cross-process value equality (dataset files + seeded
    permutations are process-independent in the device pipeline).
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def put_global_chunked(x, sharding: NamedSharding, beat=None,
                       slab_bytes: int = 256 << 20):
    """`put_global` for multi-GB host arrays under a stall watchdog.

    A single `device_put` of a campaign-scale image cache (r5: 1.87 GB for a
    30k-image fixture) can legitimately exceed `--stall-timeout` on the
    relay-backed chip; the watchdog then kills a healthy init and the
    supervisor restart loops forever without reaching a training step
    (observed round 5, `results/v3_probe30k_r5`). This uploads row-slabs of
    <= `slab_bytes`, forces each slab to land (tiny element fetch — the
    backend's dispatch is async, so returning from device_put proves
    nothing), and calls `beat()` between slabs so the watchdog clock bounds
    one slab, not the whole cache. The slabs are joined by a single compiled
    concatenate, so HBM transiently holds 2x the cache (fine: <= 4.35 GB
    caches on a 16 GB v5e).

    Multi-host or small arrays fall through to `put_global` unchanged.
    """
    x = np.asarray(x)
    if jax.process_count() > 1 or x.nbytes <= slab_bytes or x.ndim == 0:
        if beat is not None:
            beat()
        return put_global(x, sharding)
    rows_per = max(1, int(slab_bytes // max(1, x[:1].nbytes)))
    slabs = []
    for r0 in range(0, x.shape[0], rows_per):
        slab = jax.device_put(x[r0 : r0 + rows_per], sharding)
        np.asarray(slab[(0,) * x.ndim])  # force the transfer to complete
        slabs.append(slab)
        if beat is not None:
            beat()
    joined = jax.jit(
        lambda *xs: jnp.concatenate(xs, axis=0), out_shardings=sharding
    )(*slabs)
    np.asarray(joined[(0,) * x.ndim])
    if beat is not None:
        beat()
    return joined


def fetch_global(x) -> np.ndarray:
    """Fetch a global array to the host on every process (multi-host safe):
    replicated arrays read the local shard; sharded arrays allgather over DCN
    (jax.experimental.multihost_utils)."""
    if jax.process_count() == 1 or not isinstance(x, jax.Array):
        return np.asarray(x)
    if x.is_fully_replicated:
        return np.asarray(jax.device_get(x.addressable_data(0)))
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


# ---- pair-axis sharding context (consumed by models/relational.py) ----


@contextlib.contextmanager
def pair_sharding(mesh: Mesh):
    """Declare the active mesh for the relational core while tracing.

    Effects inside the context:
      * xla impl: (B, n^2, H) activations get a with_sharding_constraint of
        P('data', 'pairs', None) so GSPMD splits the pair axis.
      * pallas impl: the kernel runs as a shard_map island over the mesh
        (pairwise_core_sharded) — batch over 'data', i-objects over 'pairs'.
    """
    prev = getattr(_state, "mesh", None)
    _state.mesh = mesh if mesh.devices.size > 1 else None
    try:
        yield
    finally:
        _state.mesh = prev


def active_mesh() -> Mesh | None:
    """Mesh declared by the enclosing pair_sharding context (None = 1 device)."""
    return getattr(_state, "mesh", None)


def constrain_pairs(a):
    """Apply the pair-axis sharding constraint if a pair mesh is active."""
    mesh = active_mesh()
    if mesh is None or "pairs" not in mesh.axis_names:
        return a
    return jax.lax.with_sharding_constraint(
        a, NamedSharding(mesh, P("data", "pairs", None))
    )
