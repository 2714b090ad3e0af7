"""Training-curve figure from a METRICS.jsonl log (the reference's metric
stream, `train_IAN.py:511-529`, read back via the torn-line-safe reader).

Produces one PNG of small multiples -- per-chunk losses, pixel accuracy,
discriminator accuracy, and the per-checkpoint validation curve (pixel_acc +
frozen-encoder FID) -- for docs/REAL_TRAINING.md. One axis per panel (never a
dual-axis chart); categorical hues in fixed validated order.

Usage:
    python scripts/plot_training_curves.py runs/full/ian_simple/IAN_simpleMETRICS.jsonl \
        --out docs/assets/ian_simple_250ep_curves.png --title "IAN_simple, 250 epochs"
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Validated categorical palette (light mode), fixed slot order.
BLUE, ORANGE, AQUA, YELLOW = "#2a78d6", "#eb6834", "#1baf7a", "#eda100"
SURFACE, INK, INK2 = "#fcfcfb", "#0b0b0b", "#52514e"
GRID = "#e4e3df"


def _rolling(x, k):
    if len(x) < k:
        return np.asarray(x, np.float64)
    c = np.convolve(np.asarray(x, np.float64), np.ones(k) / k, mode="valid")
    pad = np.full(k - 1, np.nan)
    return np.concatenate([pad, c])


def _style(ax, title):
    ax.set_title(title, fontsize=9, color=INK, loc="left")
    ax.set_facecolor(SURFACE)
    ax.grid(True, color=GRID, linewidth=0.6)
    ax.tick_params(colors=INK2, labelsize=7)
    for s in ax.spines.values():
        s.set_visible(False)
    ax.set_xlabel("epoch", fontsize=7, color=INK2)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("metrics_jsonl")
    p.add_argument("--out", default="docs/assets/training_curves.png")
    p.add_argument("--title", default=None)
    p.add_argument("--smooth", type=int, default=25, help="rolling-mean window (chunks)")
    a = p.parse_args()

    from npe_tpu.utils.metrics_logging import read_records

    chunks, valid = [], []
    for r in read_records(a.metrics_jsonl):
        if "validation" in r:
            valid.append(r)
        elif "metrics" in r:
            chunks.append({"epoch": r["epoch"], "itr": r["itr"], **r["metrics"]})
    if not chunks:
        raise SystemExit(f"no chunk records in {a.metrics_jsonl}")

    ep = np.array([r["epoch"] for r in chunks], np.float64)
    # Spread chunk records evenly inside each epoch for a smooth x-axis.
    for e in np.unique(ep):
        idx = np.flatnonzero(ep == e)
        ep[idx] += np.arange(len(idx)) / max(1, len(idx))

    def col(name):
        return np.array([r.get(name, np.nan) for r in chunks], np.float64)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 4, figsize=(13, 2.9), facecolor=SURFACE)
    k = a.smooth

    ax = axes[0]
    for name, hue, label in (
        ("gen_recon_loss", BLUE, "recon"),
        ("gen_sample_loss", ORANGE, "sample"),
    ):
        y = col(name)
        ax.plot(ep, y, color=hue, linewidth=0.5, alpha=0.25)
        ax.plot(ep, _rolling(y, k), color=hue, linewidth=1.6, label=label)
    _style(ax, "generator loss (per chunk)")
    ax.legend(fontsize=7, frameon=False, labelcolor=INK2)

    ax = axes[1]
    y = col("pixel_acc")
    ax.plot(ep, y, color=BLUE, linewidth=0.5, alpha=0.25)
    ax.plot(ep, _rolling(y, k), color=BLUE, linewidth=1.6, label="train (chunk)")
    if valid:
        vx = [r["epoch"] for r in valid]
        vy = [r["validation"]["test_error"] for r in valid]
        ax.plot(vx, vy, color=ORANGE, linewidth=1.6, marker="o", markersize=3.5, label="validation")
    _style(ax, "pixel accuracy")
    ax.set_ylim(0, 1)
    ax.legend(fontsize=7, frameon=False, labelcolor=INK2, loc="lower right")

    ax = axes[2]
    for name, hue, label in (
        ("discrim_acc", BLUE, "accuracy"),
        ("discrim_d_loss", ORANGE, "D loss"),
    ):
        y = col(name)
        ax.plot(ep, y, color=hue, linewidth=0.5, alpha=0.25)
        ax.plot(ep, _rolling(y, k), color=hue, linewidth=1.6, label=label)
    _style(ax, "discriminator (per chunk)")
    ax.legend(fontsize=7, frameon=False, labelcolor=INK2)

    ax = axes[3]
    if valid and any("encoder_fid" in r["validation"] for r in valid):
        vx = [r["epoch"] for r in valid if "encoder_fid" in r["validation"]]
        vy = [r["validation"]["encoder_fid"] for r in valid if "encoder_fid" in r["validation"]]
        ax.plot(vx, vy, color=BLUE, linewidth=1.6, marker="o", markersize=3.5)
        lbl = f"{vy[-1]:.0f}"
        ax.annotate(lbl, (vx[-1], vy[-1]), textcoords="offset points", xytext=(4, 4), fontsize=7, color=INK2)
    _style(ax, "validation encoder-FID (frozen features)")

    if a.title:
        fig.suptitle(a.title, fontsize=10, color=INK, x=0.01, ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.93) if a.title else None)
    os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
    fig.savefig(a.out, dpi=170, facecolor=SURFACE)
    print("wrote", a.out)


if __name__ == "__main__":
    main()
