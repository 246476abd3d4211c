#!/usr/bin/env python
"""Relational image-retrieval demo: do ir-model g-prefix features rank
relationally-similar scenes higher than chance?

The reference's extraction mode exists for relational CBIR (SURVEY.md 2.7);
without the reference's human-judged ground truth, this demo scores retrieval
against a scene-similarity proxy: cosine similarity between per-scene
attribute-count histograms (color x shape x material x size marginals).
Reported: Spearman correlation between feature-space similarity and the proxy,
vs a random-feature baseline.

Usage:
  python scripts/retrieval_demo.py --clevr-dir <fixture> --model ir-sd \
      --checkpoint <epoch> --checkpoint-dir <dir>
"""

import argparse
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, ".")


def scene_histogram(objs):
    from rnet.data.vocab import CLEVR_COLORS, CLEVR_MATERIALS, CLEVR_SHAPES, CLEVR_SIZES

    h = []
    for key, values in (
        ("color", CLEVR_COLORS),
        ("shape", CLEVR_SHAPES),
        ("material", CLEVR_MATERIALS),
        ("size", CLEVR_SIZES),
    ):
        for v in values:
            h.append(sum(1.0 for o in objs if o[key] == v))
    return np.asarray(h)


def spearman(a, b):
    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    ra -= ra.mean()
    rb -= rb.mean()
    return float((ra * rb).sum() / np.sqrt((ra**2).sum() * (rb**2).sum()))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--clevr-dir", required=True)
    p.add_argument("--model", default="ir-sd")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--checkpoint-dir", default="model")
    p.add_argument("--split", default="val")
    p.add_argument("--features-dirs", default="/tmp/retrieval_feats")
    args = p.parse_args()

    import extract as extract_cli

    rc = extract_cli.main(
        [
            "--clevr-dir", args.clevr_dir,
            "--model", args.model,
            "--checkpoint", str(args.checkpoint),
            "--checkpoint-dir", args.checkpoint_dir,
            "--features-dirs", args.features_dirs,
            "--split", args.split,
        ]
    )
    assert rc == 0
    with open(
        os.path.join(args.features_dirs, f"{args.model}_{args.split}_gfeatures.pkl"), "rb"
    ) as f:
        dump = pickle.load(f)
    feats = dump["features"]
    names = dump["filenames"]

    with open(
        os.path.join(args.clevr_dir, "scenes", f"CLEVR_{args.split}_scenes.json")
    ) as f:
        scenes = {s["image_filename"]: s["objects"] for s in json.load(f)["scenes"]}
    hists = np.stack([scene_histogram(scenes[n]) for n in names])

    def cos_sim_matrix(x):
        x = x / (np.linalg.norm(x, axis=1, keepdims=True) + 1e-9)
        return x @ x.T

    iu = np.triu_indices(len(names), k=1)
    gt = cos_sim_matrix(hists)[iu]
    learned = cos_sim_matrix(feats)[iu]
    rand = cos_sim_matrix(np.random.RandomState(0).randn(*feats.shape))[iu]

    rho_learned = spearman(learned, gt)
    rho_random = spearman(rand, gt)
    print(
        f"retrieval proxy correlation (Spearman rho vs scene-attribute similarity):\n"
        f"  ir features : {rho_learned:+.3f}\n"
        f"  random feats: {rho_random:+.3f}"
    )


if __name__ == "__main__":
    main()
