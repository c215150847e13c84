"""Rectangle geometry invariants.

Ports the reference unit-test truth table (test/test_rectangles.py:9-39) onto
the vectorized array API and adds IoU identities.
"""

import numpy as np

from rapidobjectdetectionusingcascadedcnns_tpu.ops import rectangles as R


def rect(xmin, ymin, xmax, ymax):
    return np.array([xmin, ymin, xmax, ymax], dtype=np.float32)


class TestIntersects:
    def test_contains_each_other(self):
        outer = rect(0, 0, 10, 10)
        inner = rect(2, 2, 5, 5)
        assert R.intersects(outer, inner)
        assert R.intersects(inner, outer)

    def test_partial_overlap(self):
        a = rect(0, 0, 10, 10)
        b = rect(5, 5, 15, 15)
        assert R.intersects(a, b)
        assert R.intersects(b, a)

    def test_single_axis_overlap_is_not_enough(self):
        a = rect(0, 0, 10, 10)
        b = rect(5, 20, 15, 30)  # overlaps in x only
        assert not R.intersects(a, b)
        assert not R.intersects(b, a)
        c = rect(20, 5, 30, 15)  # overlaps in y only
        assert not R.intersects(a, c)

    def test_disjoint(self):
        a = rect(0, 0, 10, 10)
        b = rect(11, 11, 20, 20)
        assert not R.intersects(a, b)

    def test_touching_borders_intersect(self):
        a = rect(0, 0, 10, 10)
        b = rect(10, 0, 20, 10)
        assert R.intersects(a, b)

    def test_batched(self):
        a = np.stack([rect(0, 0, 10, 10)] * 3)
        b = np.stack([rect(2, 2, 5, 5), rect(11, 11, 20, 20), rect(10, 10, 12, 12)])
        np.testing.assert_array_equal(R.intersects(a, b), [True, False, True])


class TestIoU:
    def test_identical(self):
        a = rect(3, 4, 10, 12)
        assert R.iou(a, a) == 1.0

    def test_plus_one_convention(self):
        # the reference computes inclusive pixel areas (+1 per side),
        # data/rectangles.py:98-103
        a = rect(0, 0, 9, 9)  # area 10x10 = 100
        b = rect(5, 0, 14, 9)  # overlap cols 5..9 => 5x10=50; union 150
        assert abs(R.iou(a, b) - 50.0 / 150.0) < 1e-9

    def test_matrix(self):
        a = np.stack([rect(0, 0, 9, 9), rect(100, 100, 109, 109)])
        b = np.stack([rect(0, 0, 9, 9)])
        m = R.iou_matrix(a, b)
        assert m.shape == (2, 1)
        assert m[0, 0] == 1.0
        assert m[1, 0] == 0.0  # disjoint boxes: zero intersection


class TestVerticalEnlarge:
    def test_top_only_default(self):
        boxes = np.array([[10, 10, 20, 30]], dtype=np.float64)  # h=20
        out = R.vertically_enlarge(boxes, enlarge_top=0.2)
        np.testing.assert_allclose(out[0], [10, 6, 20, 30])

    def test_clamped_at_zero(self):
        boxes = np.array([[10, 2, 20, 22]], dtype=np.float64)
        out = R.vertically_enlarge(boxes, enlarge_top=0.5)
        assert out[0][1] == 0

    def test_bottom_clamped_at_img(self):
        boxes = np.array([[0, 0, 10, 90]], dtype=np.float64)
        out = R.vertically_enlarge(
            boxes, enlarge_top=None, enlarge_bottom=0.5, img_heights=np.array([100])
        )
        assert out[0][3] == 99


def test_iou_disjoint_both_axes_is_zero():
    """Regression: two negative per-axis extents used to multiply into a
    large bogus positive intersection (IoU 23.6 for these boxes)."""
    import numpy as np

    from rapidobjectdetectionusingcascadedcnns_tpu.ops import rectangles as R

    assert R.iou_single([0, 0, 10, 10], [130, 130, 250, 250]) == 0.0
    assert R.iou_single([500, 10, 520, 30], [0, 400, 40, 440]) == 0.0
    m = R.iou_matrix(
        np.array([[0, 0, 10, 10]], np.float64),
        np.array([[130, 130, 250, 250], [5, 5, 15, 15]], np.float64),
    )
    assert m[0, 0] == 0.0 and m[0, 1] > 0.0
