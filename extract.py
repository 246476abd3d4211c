#!/usr/bin/env python
"""Extract g_theta relational image features for retrieval (TPU-native).

Reference parity (SURVEY.md 2.7): load a trained "ir-*" model (question
injected late in g_theta), run images through the question-independent prefix
of g_theta, sum-aggregate over pairs, and dump one feature vector per image
into --features-dirs (pickle + h5).
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    from rnet.cli import add_common_args

    add_common_args(p)
    p.add_argument("--checkpoint", required=True, help="orbax path, epoch, or .pkl export")
    p.add_argument("--checkpoint-dir", default="model")
    p.add_argument("--features-dirs", default="features", help="output directory")
    p.add_argument("--split", default="val")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rnet.cli import config_from_args, load_dicts
    from rnet.data.clevr import ClevrImageDataset
    from rnet.data.pipeline import BatchIterator, prefetch_to_device
    from rnet.models import RN
    from rnet.train.checkpoint import CheckpointManager, import_weights
    from rnet.train.steps import TrainState, create_train_state, make_optimizer

    from rnet.cli import apply_platform

    apply_platform(args)
    dicts = load_dicts(
        args, checkpoint=args.checkpoint, checkpoint_dir=args.checkpoint_dir
    )
    cfg = config_from_args(args, dicts)
    if cfg.question_injection_position < 1:
        print(
            f"error: model {cfg.name!r} injects the question at g layer 0; "
            "feature extraction needs an 'ir' model (injection >= 1)",
            file=sys.stderr,
        )
        return 2

    model = RN(cfg=cfg, vocab_size=dicts.vocab_size)
    if cfg.state_description:
        # one feature row per IMAGE: vectorize scenes directly (the question
        # dataset would repeat each image ~10x)
        import json as _json

        from rnet.data.clevr import scene_to_objects

        with open(
            os.path.join(args.clevr_dir, "scenes", f"CLEVR_{args.split}_scenes.json")
        ) as f:
            scenes = _json.load(f)["scenes"]
        names = [s["image_filename"] for s in scenes]
        objs = np.stack(
            [scene_to_objects(s["objects"], cfg.max_objects, cfg.object_dim) for s in scenes]
        )

        class _SceneDataset:
            def __len__(self_inner):
                return len(scenes)

            def __getitem__(self_inner, i, rng=None):
                return {"objects": objs[i], "index": np.int32(i)}

        ds = _SceneDataset()
    else:
        ds = ClevrImageDataset(args.clevr_dir, args.split, image_size=cfg.image_size)
        names = list(ds.files)

    # init a skeleton state, then load weights
    sample = next(iter(BatchIterator(ds, min(args.batch_size, len(ds)), invert=False)))
    lead = next(iter(sample.values())).shape[0]
    sample.setdefault("question", np.ones((lead, cfg.question_max_len), np.int32))
    state = create_train_state(
        model, cfg, make_optimizer(1e-4), jax.random.key(0),
        jax.tree.map(jnp.asarray, sample),
    )
    if str(args.checkpoint).endswith(".pkl"):
        state = import_weights(state, args.checkpoint)
    else:
        ckpt = CheckpointManager(args.checkpoint_dir, cfg.name)
        ref = int(args.checkpoint) if str(args.checkpoint).isdigit() else args.checkpoint
        state = ckpt.restore_weights(jax.tree.map(np.asarray, state), ref)

    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats

    @jax.jit
    def extract(inputs):
        return model.apply(variables, inputs, method=RN.extract)

    feats = []
    order = []
    it = BatchIterator(ds, args.batch_size, drop_last=False, invert=False,
                       num_threads=args.num_workers)
    for batch in prefetch_to_device(iter(it)):
        key = "objects" if cfg.state_description else "image"
        out = np.asarray(extract(batch[key]))
        valid = np.asarray(batch["valid"]) if "valid" in batch else np.ones(len(out), bool)
        feats.append(out[valid])
        if "index" in batch:
            order.extend(np.asarray(batch["index"])[valid].tolist())

    features = np.concatenate(feats, axis=0)
    if order:  # feature rows must align with `names`
        assert order == sorted(order), "extraction batches arrived out of order"
    os.makedirs(args.features_dirs, exist_ok=True)
    out_pkl = os.path.join(args.features_dirs, f"{cfg.name}_{args.split}_gfeatures.pkl")
    with open(out_pkl, "wb") as f:
        pickle.dump({"features": features, "filenames": names[: len(features)]}, f)
    try:
        import h5py

        out_h5 = os.path.join(args.features_dirs, f"{cfg.name}_{args.split}_gfeatures.h5")
        with h5py.File(out_h5, "w") as f:
            f.create_dataset("features", data=features)
            f.create_dataset(
                "filenames",
                data=np.asarray(names[: len(features)], dtype=object),
                dtype=h5py.string_dtype(),
            )
    except Exception:
        out_h5 = None
    print(f"extracted {features.shape} features -> {out_pkl}" + (f", {out_h5}" if out_h5 else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
