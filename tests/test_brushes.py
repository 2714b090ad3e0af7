"""Pin npe_tpu.editor.brushes to the reference formulas' OUTPUTS
(`NPE.py:167-189`). The oracle here is a deliberately naive per-pixel loop
written from the math spec, so the vectorized implementation is checked
against the formula, not against its own code."""

import numpy as np
import pytest

from npe_tpu.editor.brushes import dampen, gk, upperlim


def _gk_oracle(c1, r1, c2, r2, im, sigma):
    out = np.zeros((3, im, im))
    for row in range(im):
        for col in range(im):
            # Distance to the box along each axis: 0 inside [lo, hi),
            # then 1, 2, ... stepping outward.
            dc = c1 - col if col < c1 else (col - c2 + 1 if col >= c2 else 0)
            dr = r1 - row if row < r1 else (row - r2 + 1 if row >= r2 else 0)
            g = np.exp(-(dc**2 / im + dr**2 / im) / (2 * sigma**2))
            out[:, row, col] = g
    return out


@pytest.mark.parametrize(
    "box,sigma",
    [((10, 20, 30, 40), 0.3), ((0, 0, 64, 64), 0.3), ((5, 5, 6, 6), 1.5), ((0, 60, 3, 64), 0.7)],
)
def test_gk_matches_formula(box, sigma):
    c1, r1, c2, r2 = box
    got = gk(c1, r1, c2, r2, im=64, sigma=sigma)
    want = _gk_oracle(c1, r1, c2, r2, 64, sigma)
    assert got.shape == (3, 64, 64)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=0)
    # Inside the box the kernel is exactly 1; channels are identical.
    assert np.all(got[:, r1:r2, c1:c2] == 1.0)
    np.testing.assert_array_equal(got[0], got[1])


def test_gk_nondefault_size():
    got = gk(2, 3, 9, 11, im=16, sigma=0.5)
    np.testing.assert_allclose(got, _gk_oracle(2, 3, 9, 11, 16, 0.5), rtol=1e-12)


def test_upperlim_matches_formula():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(3, 8, 8)).astype(np.float64)
    for h in (1.0, 4.0, 0.5):
        want = np.empty_like(img)
        for i, v in enumerate(img.flat):
            want.flat[i] = 1.0 / ((1.0 / h) * abs(v - 128) + 1.0)
        np.testing.assert_allclose(upperlim(img, h=h), want, rtol=1e-12)
    # Mid-gray passes through untouched; saturated values are damped.
    assert upperlim(np.array([128.0]))[0] == 1.0
    assert upperlim(np.array([255.0]))[0] < 0.01


def test_dampen_matches_formula():
    rng = np.random.RandomState(1)
    inp = rng.uniform(-1, 1, size=(5, 5))
    cor = rng.uniform(-1, 1, size=(5, 5))
    for thresh in (0.75, 0.2):
        got = dampen(inp, cor, thresh=thresh)
        for i in range(5):
            for j in range(5):
                if inp[i, j] + cor[i, j] > thresh:
                    assert got[i, j] == pytest.approx(thresh - inp[i, j], abs=1e-15)
                    # The damped step never overshoots the threshold.
                    assert inp[i, j] + got[i, j] == pytest.approx(thresh, abs=1e-15)
                else:
                    assert got[i, j] == cor[i, j]
