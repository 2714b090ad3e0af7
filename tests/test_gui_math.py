"""Widget-free tests for the Tk frontend's coordinate/color math
(npe_tpu/editor/gui.py helpers; reference behavior `NPE.py:28-34,143-161,
277-302`). No display needed -- the helpers are pure."""

import numpy as np

from npe_tpu.editor.gui import (
    brush_box,
    gradient_swatches,
    hex_color,
    paint_cell_bounds,
    pool_latent_canvas,
    signed_color,
)


def test_signed_color_endpoints_and_reference_formula():
    assert signed_color(0) == "#ffffff"
    assert signed_color(255) == "#ff0000"
    assert signed_color(-255) == "#0000ff"
    assert signed_color(1000) == "#ff0000"  # clamped
    assert signed_color(-1000) == "#0000ff"

    # formula equivalence vs the reference's expression (`NPE.py:32-34`)
    def ref_rb(i):
        i = int(i)
        return hex_color(
            255 + max(int(i * int(i < 0)), -255),
            255 - min(abs(int(i)), 255),
            255 - min(int(i * int(i > 0)), 255),
        )

    for v in range(-255, 256, 3):
        assert signed_color(v) == ref_rb(v), v


def test_brush_box_centering_and_clamping():
    # center of a 256-px canvas over a 64-px image at 4x, brush 12 px
    xmin, ymin, side = brush_box(128, 128, 12, 4, 64, 64)
    assert side == 12 // 4 + 1 == 4
    assert (xmin, ymin) == (128 // 4 - side // 2, 128 // 4 - side // 2)
    # corners clamp fully inside the image
    assert brush_box(0, 0, 12, 4, 64, 64)[:2] == (0, 0)
    x2, y2, s2 = brush_box(255, 255, 12, 4, 64, 64)
    assert x2 + s2 <= 64 and y2 + s2 <= 64
    # max brush size never exceeds the image
    x3, y3, s3 = brush_box(128, 128, 64, 4, 64, 64)
    assert s3 == 17 and 0 <= x3 <= 64 - s3


def test_paint_cell_bounds_clamped():
    shape = (160, 160)
    y1, y2, x1, x2 = paint_cell_bounds(80, 80, 12, 2, shape)
    assert (y1, y2, x1, x2) == (66, 90, 66, 90)
    # dab off the top-left corner clamps to empty-or-valid, never negative
    y1, y2, x1, x2 = paint_cell_bounds(0, 0, 12, 2, shape)
    assert 0 <= y1 <= y2 <= 160 and 0 <= x1 <= x2 <= 160
    # off the bottom-right corner
    y1, y2, x1, x2 = paint_cell_bounds(200, 200, 12, 2, shape)
    assert y1 <= 160 and y2 == 160 and x2 == 160


def test_gradient_swatches_sweeps_blue_to_red():
    sw = gradient_swatches(400)
    assert len(sw) == 400
    assert sw[0] == (0, "#0000ff")
    assert sw[-1] == (399, "#ff0000")
    assert sw[200][1].startswith("#ff")  # right half is in the red ramp


def test_pool_latent_canvas_cell_means():
    dim, res = (10, 10), 16
    canvas = np.zeros((dim[0] * res, dim[1] * res), np.float32)
    canvas[:res, :res] = 1.0  # fill cell (0, 0)
    canvas[16:24, 16:32] = 0.5  # half of cell (1, 1)
    zg = pool_latent_canvas(canvas, dim, res)
    assert zg.shape == dim
    np.testing.assert_allclose(zg[0, 0], 1.0)
    np.testing.assert_allclose(zg[1, 1], 0.25)
    np.testing.assert_allclose(zg[2:, 2:], 0.0)
