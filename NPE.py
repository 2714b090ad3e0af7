#!/usr/bin/env python
"""Neural Photo Editor entry point (reference `NPE.py`).

Usage: python NPE.py [--config IAN_simple] [--weights IAN_simple.npz]
                     [--valid CelebAValid.npz]
"""

import argparse

from npe_tpu.editor.gui import run

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="IAN_simple")
    p.add_argument("--weights", default=None)
    p.add_argument("--valid", default="CelebAValid.npz")
    a = p.parse_args()
    run(config=a.config, weights_path=a.weights, valid_npz=a.valid)
