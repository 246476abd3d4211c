"""Jitted train/eval steps: NLL loss, Adam, global-norm clipping.

Reference parity (SURVEY.md 3.1 hot loop): forward -> F.nll_loss ->
clip_grad_norm_(clip_norm) -> Adam step. TPU-native: one fused jit per step,
donated state (in-place HBM update), bf16 forward with fp32 params/optimizer,
and optional mesh shardings threaded in by rnet.parallel (XLA inserts the ICI
gradient allreduce from the sharding annotations — no hand-written collectives
needed for data parallelism).
"""

from __future__ import annotations


from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import ModelConfig
from ..models import RN


@struct.dataclass
class TrainState:
    """Model + optimizer + RNG state, a pure pytree (orbax-serializable)."""

    step: jnp.ndarray  # int32 scalar
    params: Any
    batch_stats: Any  # {} for state-description models (no BatchNorm)
    opt_state: Any
    rng: jax.Array  # raw uint32 key data (orbax/numpy-serializable)


def make_optimizer(
    lr: optax.ScalarOrSchedule,
    clip_norm: float = 50.0,
    weight_decay: float = 0.0,
    inject_lr: bool = False,
) -> optax.GradientTransformation:
    """Adam(lr) with global-norm clipping, matching the reference loop.

    inject_lr=True wraps adam in optax.inject_hyperparams so the LR can be
    updated per epoch without recompiling (see loop.set_learning_rate).
    """
    chain = []
    if clip_norm and clip_norm > 0:
        chain.append(optax.clip_by_global_norm(clip_norm))
    if weight_decay and weight_decay > 0:
        chain.append(optax.add_decayed_weights(weight_decay))
    def adam(learning_rate):
        return optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)

    chain.append(
        optax.inject_hyperparams(adam)(learning_rate=lr) if inject_lr else adam(lr)
    )
    return optax.chain(*chain)


def create_train_state(
    model: RN,
    cfg: ModelConfig,
    optimizer: optax.GradientTransformation,
    rng: jax.Array,
    sample_batch: Dict[str, jnp.ndarray],
    image_cache=None,
) -> TrainState:
    inputs = _inputs_of(sample_batch, cfg, image_cache)
    variables = model.init(rng, inputs, sample_batch["question"], train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
        rng=jax.random.key_data(rng),
    )


def _inputs_of(batch: Dict[str, jnp.ndarray], cfg: ModelConfig, image_cache=None):
    if cfg.state_description:
        return batch["objects"]
    if image_cache is not None and "image_idx" in batch:
        # device-resident pipeline: gather this batch's (padded) images from
        # the HBM cache — only int32 indices ever cross host->device
        rows = image_cache[batch["image_idx"]]
        if rows.ndim == 3:  # lane-padded flat train cache (pad_flat_cache)
            from ..kernels.augment import unflatten_rows

            rows = unflatten_rows(rows)
        return rows
    return batch["image"]


def _fused_augment_ok(cfg: ModelConfig) -> bool:
    if cfg.state_description or not cfg.device_augment:
        return False
    if cfg.augment_impl == "xla":
        return False
    import jax as _jax

    return _jax.default_backend() == "tpu" or cfg.augment_impl == "pallas"


def _train_inputs(batch, cfg: ModelConfig, image_cache, aug_rng):
    """Training inputs + whether augmentation already happened.

    When the fused Pallas augment kernel applies (TPU, from-pixels,
    device_augment on), the HBM image gather, per-sample crop, rotation and
    uint8 normalization all happen in ONE memory-bound kernel pass
    (rnet/kernels/augment.py) instead of ~12 ms of XLA gathers+rolls per
    512-batch; the model then skips its in-forward augmentation.
    """
    if not _fused_augment_ok(cfg):  # includes every state_description config
        return _inputs_of(batch, cfg, image_cache), False
    from ..kernels.augment import gather_augment
    from ..parallel.mesh import active_mesh

    if image_cache is not None and "image_idx" in batch:
        src, idx, batch_local = image_cache, batch["image_idx"], False
    elif "image" in batch and batch["image"].dtype == jnp.uint8 and (
        batch["image"].shape[1] > cfg.image_size
    ):
        # per-batch padded images (standard pipeline): the source is
        # data-sharded with the batch, not a replicated cache
        src = batch["image"]
        idx = jnp.arange(src.shape[0], dtype=jnp.int32)
        batch_local = True
    else:  # unpadded/float inputs: nothing for the kernel to crop
        return _inputs_of(batch, cfg, image_cache), False
    out = gather_augment(
        src, idx, aug_rng, cfg.image_size,
        out_dtype=jnp.dtype(cfg.compute_dtype), mesh=active_mesh(),
        batch_local=batch_local,
    )
    return out, True


def train_step(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    image_cache=None,
    *,
    model: RN,
    cfg: ModelConfig,
    optimizer: optax.GradientTransformation,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One SGD step. Pure; jit with static model/cfg/optimizer via closure."""
    rng, dropout_rng, aug_rng = jax.random.split(
        jax.random.wrap_key_data(state.rng), 3
    )
    inputs, augmented = _train_inputs(batch, cfg, image_cache, aug_rng)
    labels = batch["answer"]

    def loss_fn(params):
        variables = {"params": params}
        mutable = []
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
            mutable = ["batch_stats"]
        kw = {"mutable": mutable} if mutable else {}
        out = model.apply(
            variables,
            inputs,
            batch["question"],
            train=True,
            augmented=augmented,
            n_objects=batch.get("n_objects") if cfg.object_mask else None,
            rngs={"dropout": dropout_rng},
            **kw,
        )
        logp, new_stats = out if mutable else (out, {})
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()
        acc = (logp.argmax(-1) == labels).mean()
        return nll, (acc, new_stats)

    (loss, (acc, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = state.replace(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_stats.get("batch_stats", state.batch_stats),
        opt_state=new_opt,
        rng=jax.random.key_data(rng),
    )
    metrics = {
        "loss": loss,
        "accuracy": acc,
        "grad_norm": optax.global_norm(grads),
    }
    return new_state, metrics


def eval_step(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    image_cache=None,
    *,
    model: RN,
    cfg: ModelConfig,
) -> Dict[str, jnp.ndarray]:
    """Predictions + per-sample correctness (masked by batch['valid'])."""
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    logp = model.apply(
        variables,
        _inputs_of(batch, cfg, image_cache),
        batch["question"],
        train=False,
        n_objects=batch.get("n_objects") if cfg.object_mask else None,
    )
    pred = logp.argmax(-1)
    labels = batch["answer"]
    valid = batch.get("valid", jnp.ones_like(labels, dtype=bool))
    correct = (pred == labels) & valid
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    out = {
        "pred": pred,
        "label": labels,
        "correct": correct,
        "valid": valid,
        "nll_sum": (nll * valid).sum(),
    }
    if "index" in batch:  # pass-through for per-question-category reporting
        out["index"] = batch["index"]
    return out


def make_jitted_steps(model, cfg, optimizer, donate: bool = True):
    """jit-compiled (train_step, eval_step) closures."""
    ts = partial(train_step, model=model, cfg=cfg, optimizer=optimizer)
    es = partial(eval_step, model=model, cfg=cfg)
    jts = jax.jit(ts, donate_argnums=(0,) if donate else ())
    jes = jax.jit(es)
    return jts, jes


def make_chunked_steps(model, cfg, optimizer, donate: bool = True):
    """Multi-step dispatch for device-resident data (the 'device' pipeline).

    One jit call runs K steps via lax.scan: per step, the (bs,) sample
    indices gather the batch from per-question device arrays (`data`), so the
    host sends only an int32 (K, bs) index block per dispatch. This amortizes
    dispatch/transfer latency K-fold — on fast hosts it is merely tidy, on a
    tunneled TPU it is the difference between latency-bound and compute-bound
    training.
    """
    ts = partial(train_step, model=model, cfg=cfg, optimizer=optimizer)
    es = partial(eval_step, model=model, cfg=cfg)

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_chunk(state, idx_chunk, data, image_cache):
        def body(st, idx):
            batch = jax.tree.map(lambda v: v[idx], data)
            st, m = ts(st, batch, image_cache)
            return st, jnp.stack([m["loss"], m["accuracy"], m["grad_norm"]])

        state, ms = jax.lax.scan(body, state, idx_chunk)
        return state, ms  # (K, 3): loss, accuracy, grad_norm per step

    # pack the per-chunk eval outputs into ONE int32 array so the host pays a
    # single relay round-trip per chunk instead of four (pred/label/valid are
    # small ints -> bit fields; the nll_sum float rides along bitcast as an
    # extra column). The relay fetch is the eval wall-clock bottleneck on a
    # tunneled chip (RESULTS.md eval roofline); answers >= 256 would overflow
    # the 8-bit label field, so such configs keep the 4-array form.
    pack = cfg.n_answers < 256

    @jax.jit
    def eval_chunk(state, idx_chunk, valid_chunk, data, image_cache):
        def body(_, iv):
            idx, valid = iv
            batch = jax.tree.map(lambda v: v[idx], data)
            batch["valid"] = valid
            out = es(state, batch, image_cache)
            if pack:
                packed = (
                    out["pred"].astype(jnp.int32)
                    | (out["label"].astype(jnp.int32) << 8)
                    | (out["valid"].astype(jnp.int32) << 16)
                )
                nll_bits = jax.lax.bitcast_convert_type(
                    out["nll_sum"].astype(jnp.float32), jnp.int32
                )
                return None, jnp.concatenate([packed, nll_bits[None]], axis=0)
            return None, (out["pred"], out["label"], out["valid"], out["nll_sum"])

        _, outs = jax.lax.scan(body, None, (idx_chunk, valid_chunk))
        return outs  # packed: (K, bs+1) int32; else each (K, bs) / (K,)

    return train_chunk, eval_chunk


def unpack_eval_chunk(arr: "np.ndarray"):
    """Host-side inverse of the packed eval_chunk form: (K, bs+1) int32 ->
    (pred, label, valid, nll_sum)."""
    import numpy as np

    packed = arr[:, :-1]
    nll = float(arr[:, -1].copy().view(np.float32).sum())
    pred = packed & 0xFF
    label = (packed >> 8) & 0xFF
    valid = ((packed >> 16) & 1).astype(bool)
    return pred, label, valid, nll
