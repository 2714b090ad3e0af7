"""Pixel-range helpers.

The reference duplicates these in every driver (`train_IAN.py:35-40`,
`sample_IAN.py:32-38`, `NPE.py:37-41`); here they live in one place and work
on numpy arrays and jax arrays alike.
"""


def to_tanh(x):
    """[0, 255] -> [-1, 1]."""
    return 2.0 * (x / 255.0) - 1.0


def from_tanh(x):
    """[-1, 1] -> [0, 255]."""
    return 255.0 * (x + 1.0) / 2.0
