"""Paint-edit demo against a trained checkpoint: load weights, infer a real
validation image, apply a few brush strokes + a lighten scroll, and save a
before/after/strip PNG (the reference's product loop, `NPE.py:192-235`,
driven headlessly through EditSession).

Usage (from the repo root):
    python scripts/edit_demo.py --config IAN --weights runs/ian80/IAN.npz \
        --valid runs/real3/valid.npz --out docs/edit_demo_ian.png
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="IAN")
    p.add_argument("--weights", required=True)
    p.add_argument("--valid", default="runs/real3/valid.npz")
    p.add_argument("--index", type=int, default=42)
    p.add_argument("--out", default="docs/edit_demo.png")
    p.add_argument(
        "--cpu",
        action="store_true",
        help="run on the CPU backend (e.g. while the TPU is busy training)",
    )
    a = p.parse_args()

    if a.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from npe_tpu.data.datasets import NpzImageDataset, to_tanh
    from npe_tpu.editor.engine import EditSession

    session = EditSession(config=a.config, weights_path=a.weights)
    img = to_tanh(np.float32(NpzImageDataset(a.valid).get_data([a.index])[0]))
    session.infer(img)

    frames = [("original", session.GIM.copy()), ("reconstruction", session.RECON.copy())]
    # red brush upper-left, green brush center, lighten lower half
    session.paint_stroke(8, 8, 24, 24, (255, 64, 64))
    frames.append(("paint red", session.im_uint8().copy()))
    session.paint_stroke(24, 28, 44, 44, (64, 220, 64))
    frames.append(("paint green", session.im_uint8().copy()))
    session.scroll_patch(8, 36, 56, 60, +1)
    frames.append(("lighten", session.im_uint8().copy()))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, len(frames), figsize=(2.2 * len(frames), 2.6))
    for ax, (title, fr) in zip(axes, frames):
        fr = np.asarray(fr)  # CHW; GIM/RECON tanh floats, edits uint8
        if fr.dtype != np.uint8:
            fr = np.uint8(np.clip((fr + 1) * 127.5, 0, 255))
        ax.imshow(fr.transpose(1, 2, 0))
        ax.set_title(title, fontsize=8)
        ax.axis("off")
    os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(a.out, dpi=180)
    print("wrote", a.out)


if __name__ == "__main__":
    main()
