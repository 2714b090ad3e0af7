"""Optional neural-painter helpers (reference `NPE.py:163-189`): present in
the reference but unused in its main path; kept for capability parity."""

import numpy as np


def gk(c1, r1, c2, r2, im=64, sigma=0.3):
    """Localized Gaussian smoothing kernel around the brush box
    (`NPE.py:167-175`). Returns (3, im, im)."""
    x = np.repeat(
        [np.concatenate([np.mgrid[-c1:0], np.zeros(c2 - c1), np.mgrid[1 : 1 + im - c2]])],
        im,
        axis=0,
    )
    y = np.repeat(
        np.vstack(np.concatenate([np.mgrid[-r1:0], np.zeros(r2 - r1), np.mgrid[1 : 1 + im - r2]])),
        im,
        axis=1,
    )
    g = np.exp(-(x**2 / float(im) + y**2 / float(im)) / (2 * sigma**2))
    return np.repeat([g], 3, axis=0)


def upperlim(image, h=1.0):
    """Reduce change likelihood near saturated values (`NPE.py:179-181`)."""
    return 1.0 / ((1.0 / h) * np.abs(image - 128) + 1)


def dampen(input, correct, thresh=0.75):
    """Slow changes that would push pixels past `thresh` (`NPE.py:184-189`)."""
    m = (input + correct) > thresh
    return -input * m + correct * (1 - m) + thresh * m
