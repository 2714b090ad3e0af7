"""A/B figure for the adaptive-ratio guard on the full-IAN late-phase
pathology (VERDICT r4 item 5; docs/REAL_TRAINING.md). Both legs share the
epoch-0..49 base prefix (scripts/ab_ian_guard.sh forks the SAME epoch-49
train state + FID basis), so their trajectories are directly comparable.

Panels: validation encoder-FID (the headline), per-chunk discriminator
accuracy (the signal the guard acts on), and the guard leg's per-chunk
d_steps_skipped (proof of engagement). One axis per panel; categorical
hues in fixed validated order.

Usage:
    python scripts/plot_ab_guard.py runs/ian_ab_ctrl/IANMETRICS.jsonl \
        runs/ian_ab_guard/IANMETRICS.jsonl --fork-epoch 50 \
        --out docs/assets/ian_ab_guard_curves.png
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from plot_training_curves import BLUE, GRID, INK2, ORANGE, SURFACE, _rolling, _style


def load(path):
    from npe_tpu.utils.metrics_logging import read_records

    chunks, valid = [], []
    for r in read_records(path):
        if "validation" in r:
            valid.append(r)
        elif "metrics" in r:
            chunks.append({"epoch": r["epoch"], "itr": r["itr"], **r["metrics"]})
    ep = np.array([r["epoch"] for r in chunks], np.float64)
    for e in np.unique(ep):
        idx = np.flatnonzero(ep == e)
        ep[idx] += np.arange(len(idx)) / max(1, len(idx))
    return ep, chunks, valid


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ctrl_jsonl")
    p.add_argument("guard_jsonl")
    p.add_argument("--fork-epoch", type=int, default=50)
    p.add_argument("--out", default="docs/assets/ian_ab_guard_curves.png")
    p.add_argument("--smooth", type=int, default=25)
    a = p.parse_args()

    legs = {"control (guard off)": load(a.ctrl_jsonl), "guard on (acc 0.8)": load(a.guard_jsonl)}

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(11, 3.0), facecolor=SURFACE)
    hues = {"control (guard off)": BLUE, "guard on (acc 0.8)": ORANGE}

    ax = axes[0]
    for label, (ep, chunks, valid) in legs.items():
        vx = [r["epoch"] for r in valid if "encoder_fid" in r["validation"]]
        vy = [r["validation"]["encoder_fid"] for r in valid if "encoder_fid" in r["validation"]]
        ax.plot(vx, vy, color=hues[label], linewidth=1.6, marker="o", markersize=3.5, label=label)
        if vx:
            ax.annotate(
                f"{vy[-1]:.0f}", (vx[-1], vy[-1]), textcoords="offset points", xytext=(4, 4), fontsize=7, color=INK2
            )
    ax.axvline(a.fork_epoch, color=GRID, linewidth=1.2, linestyle="--")
    _style(ax, "validation encoder-FID (shared prefix to fork)")
    ax.legend(fontsize=7, frameon=False, labelcolor=INK2)

    ax = axes[1]
    for label, (ep, chunks, valid) in legs.items():
        y = np.array([r.get("discrim_acc", np.nan) for r in chunks], np.float64)
        ax.plot(ep, y, color=hues[label], linewidth=0.5, alpha=0.2)
        ax.plot(ep, _rolling(y, a.smooth), color=hues[label], linewidth=1.6, label=label)
    ax.axvline(a.fork_epoch, color=GRID, linewidth=1.2, linestyle="--")
    _style(ax, "discriminator accuracy (per chunk)")
    ax.set_ylim(0.4, 1.0)
    ax.legend(fontsize=7, frameon=False, labelcolor=INK2, loc="lower right")

    ax = axes[2]
    ep, chunks, _ = legs["guard on (acc 0.8)"]
    y = np.array([r.get("d_steps_skipped", np.nan) for r in chunks], np.float64)
    ax.plot(ep, y, color=ORANGE, linewidth=1.0)
    ax.axvline(a.fork_epoch, color=GRID, linewidth=1.2, linestyle="--")
    _style(ax, "guard leg: D steps skipped per chunk")

    fig.tight_layout()
    os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
    fig.savefig(a.out, dpi=170, facecolor=SURFACE)
    print("wrote", a.out)


if __name__ == "__main__":
    main()
