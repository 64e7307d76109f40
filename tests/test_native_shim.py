"""Native C++ media shim vs cv2 oracles (auto-built via make)."""

import numpy as np
import pytest

from strongsort_yolo_tpu.media import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native shim not built (no toolchain)"
)


def blank(h=60, w=80):
    return np.zeros((h, w, 3), np.uint8)


def test_filled_rect_matches_cv2():
    import cv2

    a, b = blank(), blank()
    native.draw_rect(a, 10, 12, 40, 30, (255, 10, 20), -1)
    cv2.rectangle(b, (10, 12), (40, 30), (255, 10, 20), -1)
    np.testing.assert_array_equal(a, b)


def test_outline_rect_matches_cv2_t1():
    import cv2

    a, b = blank(), blank()
    native.draw_rect(a, 5, 5, 50, 40, (0, 255, 0), 1)
    cv2.rectangle(b, (5, 5), (50, 40), (0, 255, 0), 1)
    np.testing.assert_array_equal(a, b)


def test_rect_clipping_safe():
    a = blank()
    native.draw_rect(a, -10, -10, 200, 200, (1, 2, 3), 2)
    native.draw_rect(a, -5, -5, 20, 20, (9, 9, 9), -1)
    assert a[0, 0, 0] == 9  # filled region clipped, no crash


def test_blend_matches_cv2_addweighted():
    import cv2

    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, (30, 40, 3), dtype=np.uint8)
    b = rng.integers(0, 255, (30, 40, 3), dtype=np.uint8)
    want = cv2.addWeighted(a, 0.7, b, 0.3, 0)
    got = a.copy()
    native.blend(got, b, 0.7, 0.3)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_fill_poly_matches_cv2_triangle():
    import cv2

    pts = [(10, 5), (70, 20), (30, 50)]
    a, b = blank(), blank()
    native.fill_poly(a, pts, (0, 0, 200))
    cv2.fillPoly(b, [np.int32(pts)], (0, 0, 200))
    # rasterization conventions differ slightly at the border; compare
    # interior agreement
    diff = (a[..., 2] > 0) != (b[..., 2] > 0)
    assert diff.mean() < 0.04


def test_line_connects_endpoints():
    a = blank()
    native.draw_line(a, 5, 5, 70, 50, (255, 255, 255), 2)
    assert a[5, 5].sum() > 0
    assert a[50, 70].sum() > 0


def test_text_renders_pixels():
    a = blank(40, 200)
    native.draw_text(a, "FPS: 42.5", 2, 2, (0, 0, 255), 1)
    assert (a[..., 2] > 0).sum() > 40  # some red glyph pixels
    w, h = native.text_size("FPS: 42.5", 1)
    assert w == 9 * 8 and h == 13


def test_resize_matches_cv2():
    import cv2

    rng = np.random.default_rng(1)
    src = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    got = native.resize_bilinear(src, 24, 32)
    want = cv2.resize(src, (32, 24), interpolation=cv2.INTER_LINEAR)
    assert np.abs(got.astype(int) - want.astype(int)).mean() < 2.0


def test_letterbox_geometry():
    src = np.full((90, 160, 3), 200, np.uint8)
    out = native.letterbox_u8(src, 64)
    assert out.shape == (64, 64, 3)
    # top/bottom pad rows are gray 114
    assert np.all(out[0] == 114)
    assert np.all(out[-1] == 114)
    # center content preserved
    assert out[32, 32, 0] > 150
