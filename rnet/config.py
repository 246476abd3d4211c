"""Config system: named hyperparameter sets in config.json + CLI overrides.

Mirrors the reference's config mechanism (reference: config.json at repo root,
selected by ``--model`` in train.py/test.py, with per-field CLI overrides such
as ``--dropout`` and ``--question-injection``; SURVEY.md section 2 item 10 and
section 5 "Config / flag system"). The schema is ours but reference-shaped: a
flat JSON dict mapping a model name to its hyperparameters.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, Optional, Tuple

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_CONFIG_PATH = os.path.join(_REPO_ROOT, "config.json")


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Hyperparameters for one named RN variant.

    Frozen + hashable so it can ride along as a static argument to jitted
    functions without retrigger surprises.
    """

    name: str = "original-fp"
    state_description: bool = False

    # --- from-pixels path ---
    image_size: int = 128
    conv_channels: Tuple[int, ...] = (24, 24, 24, 24)
    conv_kernel: int = 3
    conv_stride: int = 2

    # --- state-description path ---
    max_objects: int = 12
    object_dim: int = 18  # 3 coords + 8 color + 3 shape + 2 material + 2 size
    # exclude pad-object pairs from the relational sum (the reference lets
    # zero-vector pads participate — SURVEY.md 3.4; default OFF for parity).
    object_mask: bool = False

    # --- question encoder ---
    lstm_word_emb: int = 32
    lstm_hidden: int = 128
    question_max_len: int = 48
    # True (default): mask-aware LSTM — pad steps carry state through
    # unchanged, encoding independent of padding length. False: reference
    # behavior — the recurrence runs over pad steps too (zero inputs via
    # padding_idx=0, but gate biases drift the state). With the default
    # question inversion pads PRECEDE the tokens, so False reproduces the
    # reference's leading pad-bias drift exactly (README "Parity notes";
    # A/B knob for quantifying the documented deviation).
    lstm_mask_pads: bool = True

    # --- relational core ---
    g_layers: Tuple[int, ...] = (256, 256, 256, 256)
    question_injection_position: int = 0
    f_layers: Tuple[int, ...] = (256, 256)
    dropout: float = 0.5
    pair_dropout: float = 0.0
    # 'sum' (reference parity) | 'mean': pooling over the n^2 pair axis.
    # Mathematically a reparameterization of f_phi's first layer (W -> W*n^2),
    # but at extreme pair counts it changes the TRAINING story: at n=1024
    # (1,048,576 pairs/question) sum-pooling saturates f at init (step-10
    # grad norm ~1e5, measured) and Adam parks the run at the majority-class
    # prior; mean-pooling keeps f's input O(1) at any grid size.
    pair_pool: str = "sum"

    # --- runtime ---
    n_answers: int = 28
    # from-pixels train-time rotation on device (see rnet/data/augment.py);
    # pairs with the decoded-image cache pipeline.
    device_augment: bool = False
    # 'auto' | 'naive' | 'xla' | 'pallas' : implementation of the pairwise core.
    rl_impl: str = "auto"
    # 'auto' | 'pallas' | 'xla': train-time augmentation implementation.
    # auto/pallas on TPU = the fused gather+crop+rotate+normalize kernel
    # (rnet/kernels/augment.py); xla = the round-1 in-model formulation.
    augment_impl: str = "auto"
    # compute dtype for the hot path ('bfloat16' or 'float32'); params stay fp32.
    compute_dtype: str = "bfloat16"

    @property
    def grid(self) -> int:
        """Side of the conv feature grid (from-pixels)."""
        g = self.image_size
        for _ in self.conv_channels:
            g = (g + 2 * (self.conv_kernel // 2) - self.conv_kernel) // self.conv_stride + 1
        return g

    @property
    def n_objects(self) -> int:
        return self.max_objects if self.state_description else self.grid * self.grid

    @property
    def obj_feat_dim(self) -> int:
        """Per-object feature dim entering the relational core."""
        if self.state_description:
            return self.object_dim
        return self.conv_channels[-1] + 2  # conv features + 2-D coordinate tag

    def replace(self, **kw: Any) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


_TUPLE_FIELDS = {"conv_channels", "g_layers", "f_layers"}


def _coerce(d: Dict[str, Any]) -> Dict[str, Any]:
    out = {}
    valid = {f.name for f in dataclasses.fields(ModelConfig)}
    for k, v in d.items():
        if k not in valid:
            continue
        if k in _TUPLE_FIELDS and isinstance(v, list):
            v = tuple(v)
        out[k] = v
    return out


def load_config(
    model: str = "original-fp",
    config_path: Optional[str] = None,
    overrides: Optional[Dict[str, Any]] = None,
) -> ModelConfig:
    """Load a named model config, applying CLI-style overrides.

    Reference behavior: ``hyp = json.load(open('config.json'))[args.model]``
    then per-field CLI overrides (SURVEY.md section 3.1).
    """
    path = config_path or DEFAULT_CONFIG_PATH
    with open(path) as f:
        all_cfg = json.load(f)
    if model not in all_cfg:
        raise KeyError(
            f"model {model!r} not in {path}; available: {sorted(all_cfg)}"
        )
    d = _coerce(all_cfg[model])
    d["name"] = model
    if overrides:
        d.update(_coerce({k: v for k, v in overrides.items() if v is not None}))
    cfg = ModelConfig(**d)
    if cfg.pair_pool not in ("sum", "mean"):
        raise ValueError(
            f"pair_pool must be 'sum' or 'mean', got {cfg.pair_pool!r}"
        )
    if cfg.object_mask and not cfg.state_description:
        # fail at startup, not at the first train step inside jit: only the
        # state-description datasets carry the per-sample n_objects the mask
        # needs (the model raises too, as the backstop for direct use)
        raise ValueError(
            f"--object-mask requires a state-description model; "
            f"{model!r} is from-pixels (every grid cell is a real object)"
        )
    return cfg


def list_models(config_path: Optional[str] = None) -> List[str]:
    path = config_path or DEFAULT_CONFIG_PATH
    with open(path) as f:
        return sorted(json.load(f))
