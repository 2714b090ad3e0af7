"""Harvest a (possibly still-running) training run's artifacts into
docs/assets: the deduped METRICS.jsonl stream, the first/latest checkpoint
grids, a training-curve figure, and a markdown summary table for
docs/REAL_TRAINING.md.

Dedup: a babysitter mishap can briefly run two trainers against one out-dir
(observed round 3); records are keyed by (epoch, itr, kind) and the LAST
record wins, matching the trainer that kept running.

Usage (from the repo root):
    python scripts/harvest_run.py runs/ian80 IAN --tag ian_80ep
"""

import argparse
import glob
import json
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dedupe(metrics_path):
    recs = {}
    with open(metrics_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                r = json.loads(line)
            except json.JSONDecodeError:  # torn tail line of a live run
                continue
            kind = "validation" if "validation" in r else "chunk"
            recs[(r["epoch"], r["itr"], kind)] = r
    return [recs[k] for k in sorted(recs, key=lambda k: (k[0], k[1], k[2]))]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("run_dir")
    p.add_argument("name", help="model/config name, e.g. IAN")
    p.add_argument("--tag", required=True, help="asset filename prefix")
    p.add_argument("--assets", default="docs/assets")
    a = p.parse_args()

    os.makedirs(a.assets, exist_ok=True)
    metrics_in = os.path.join(a.run_dir, a.name + "METRICS.jsonl")
    recs = dedupe(metrics_in)
    metrics_out = os.path.join(a.assets, f"{a.tag}_metrics.jsonl")
    with open(metrics_out, "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")

    grids = sorted(
        glob.glob(os.path.join(a.run_dir, "pics", f"{a.name}_*.png")),
        key=lambda s: int(s.rsplit("_", 1)[1][:-4]),
    )
    copied = []
    for g in [grids[0], grids[-1]] if grids else []:
        dst = os.path.join(a.assets, f"{a.tag}_grid_epoch{int(g.rsplit('_', 1)[1][:-4])}.png")
        if not (os.path.exists(dst) and os.path.samefile(g, dst)):
            shutil.copyfile(g, dst)
        copied.append(dst)

    curves = os.path.join(a.assets, f"{a.tag}_curves.png")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "plot_training_curves.py"),
            metrics_out,
            "--out",
            curves,
            "--title",
            a.tag,
        ],
        capture_output=True,
        text=True,
    )
    if r.returncode != 0:
        # A failed render must be VISIBLE in the harvest log, not a silently
        # missing/stale curves.png while the summary reports success.
        print(f"WARNING: curve render failed (rc={r.returncode}): {r.stderr.strip()[-500:]}")

    # Markdown summary: one row per validation checkpoint.
    rows = [r for r in recs if "validation" in r]
    print(f"harvested {len(recs)} records -> {metrics_out}")
    print(f"grids: {copied}")
    print("| epoch | valid pixel_acc | valid mse | encoder-FID |")
    print("|---|---|---|---|")
    for r in rows:
        v = r["validation"]
        print(
            f"| {r['epoch']} | {v.get('test_error', float('nan')):.4f} "
            f"| {v.get('mse', float('nan')):.4f} | {v.get('encoder_fid', float('nan')):.1f} |"
        )
    last_chunk = [r for r in recs if "metrics" in r]
    if last_chunk:
        m = last_chunk[-1]
        print(
            f"last chunk: epoch={m['epoch']} itr={m['itr']} "
            + " ".join(f"{k}={v:.4f}" for k, v in m["metrics"].items())
        )


if __name__ == "__main__":
    main()
