"""Gaussian blur must match the host-side scipy call the reference uses in
its edit loop (`NPE.py:224`)."""

import numpy as np

from npe_tpu.ops.filters import gaussian_blur_2d


def test_matches_scipy_gaussian_filter():
    import scipy.ndimage

    rng = np.random.RandomState(0)
    x = rng.rand(64, 64).astype(np.float32)
    ours = np.asarray(gaussian_blur_2d(x, 0.7))
    ref = scipy.ndimage.gaussian_filter(x, 0.7)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_other_sigmas():
    import scipy.ndimage

    rng = np.random.RandomState(1)
    x = rng.rand(32, 48).astype(np.float32)
    for sigma in (0.3, 1.0, 2.5):
        ours = np.asarray(gaussian_blur_2d(x, sigma))
        ref = scipy.ndimage.gaussian_filter(x, sigma)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
