#!/usr/bin/env python
"""Collect per-epoch eval dumps of a training campaign into one curve.

The Trainer dumps `val_epochNNN_accuracy.csv` (overall + per-question-family
accuracy, mean nll) into --test-results-dir every epoch (SURVEY.md 3.1 eval
reporting). This script folds them into a single `campaign_curve.csv` and a
matplotlib curve PNG for RESULTS.md.

An optional `annotations.csv` (epoch,note) in the campaign dir is folded into
a `note` column and drawn as markers on the PNG, so known infra events (a
shared-chip eval dip, a resume boundary) are visible in the artifact itself
instead of only in RESULTS.md prose (round-3 verdict weak #3).

Usage: python scripts/summarize_campaign.py results/campaign_r3
"""
import csv
import glob
import os
import re
import sys


def load_annotations(d):
    p = os.path.join(d, "annotations.csv")
    notes = {}
    if os.path.exists(p):
        with open(p) as f:
            for r in csv.reader(f):
                if r and r[0] != "epoch":
                    notes[int(r[0])] = r[1]
    return notes


def rows_from_logs(d):
    """Fallback source: `Eval Epoch: N accuracy: A nll: L` lines from the
    campaign's train logs (round 5: v3 campaigns log per-epoch evals but
    only dump per-family CSVs for the dedicated best-epoch test.py run).
    Later phases resume earlier epochs; last occurrence of an epoch wins."""
    pat = re.compile(r"Eval Epoch:\s*(\d+)\s+accuracy:\s*([\d.]+)\s+nll:\s*([\d.]+)")
    by_epoch = {}
    for p in sorted(glob.glob(os.path.join(d, "train*.log"))):
        with open(p) as f:
            for line in f:
                m = pat.search(line)
                if m:
                    by_epoch[int(m.group(1))] = {
                        "epoch": int(m.group(1)),
                        "overall_accuracy": float(m.group(2)),
                        "mean_nll": float(m.group(3)),
                    }
    return list(by_epoch.values())


def main(d):
    rows = []
    for p in sorted(glob.glob(os.path.join(d, "val_epoch*_accuracy.csv"))):
        m = re.search(r"val_epoch(\d+)_accuracy", p)
        with open(p) as f:
            vals = {r[0]: float(r[1]) for r in csv.reader(f) if r and r[0] != "metric"}
        vals["epoch"] = int(m.group(1))
        rows.append(vals)
    if not rows:
        rows = rows_from_logs(d)
    if not rows:
        sys.exit(f"no val_epoch*_accuracy.csv or train*.log evals under {d}")
    rows.sort(key=lambda r: r["epoch"])
    notes = load_annotations(d)
    # union over all epochs: per-category rows may appear mid-campaign
    cats = sorted({k for r in rows for k in r if k.startswith("category_")})
    cols = ["epoch", "overall_accuracy", "mean_nll"] + cats + ["note"]
    out = os.path.join(d, "campaign_curve.csv")
    with open(out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(cols)
        for r in rows:
            r["note"] = notes.get(r["epoch"], "")
            w.writerow([r.get(c, "") for c in cols])
    best = max(rows, key=lambda r: r["overall_accuracy"])
    print(f"{len(rows)} epochs -> {out}")
    print(f"best: epoch {best['epoch']} overall {best['overall_accuracy']:.4f}")
    print(f"last: epoch {rows[-1]['epoch']} overall {rows[-1]['overall_accuracy']:.4f}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 4))
        ep = [r["epoch"] for r in rows]
        ax.plot(ep, [r["overall_accuracy"] for r in rows], lw=2, label="overall")
        for c in cols[3:]:
            ax.plot(ep, [r.get(c) for r in rows], lw=0.8, alpha=0.6,
                    label=c.replace("category_", ""))
        for e, note in sorted(notes.items()):
            ax.axvline(e, color="crimson", lw=0.8, ls="--", alpha=0.7)
            short = note if len(note) <= 48 else note[:45] + "..."
            ax.annotate(  # full text lives in the csv's note column
                short, (e, 0.05), rotation=90, fontsize=6, color="crimson",
                ha="right", va="bottom", clip_on=True,
            )
        ax.set_xlabel("epoch"); ax.set_ylabel("val accuracy"); ax.set_ylim(0, 1.02)
        ax.legend(fontsize=7, loc="lower right"); ax.grid(alpha=0.3)
        png = os.path.join(d, "campaign_curve.png")
        fig.tight_layout(); fig.savefig(png, dpi=120)
        print(f"curve -> {png}")
    except Exception as e:  # matplotlib optional
        print(f"(no plot: {e})")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "results/campaign_r3")
