"""Native C++ kernels vs the Python implementations."""

import numpy as np
import pytest

from rapidobjectdetectionusingcascadedcnns_tpu import native
from rapidobjectdetectionusingcascadedcnns_tpu.ops import nms, pyramid

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def _random_clusters(rng, n_clusters, per_cluster, jitter, size=60):
    rects = []
    for _ in range(n_clusters):
        cx, cy = rng.randint(50, 400, size=2)
        for _ in range(per_cluster):
            dx, dy, dw, dh = rng.randint(-jitter, jitter + 1, size=4)
            rects.append((cx + dx, cy + dy, size + dw, size + dh))
    return np.array(rects, dtype=np.float64)


def _sets(rects, weights):
    return sorted(
        map(tuple, np.concatenate([rects, weights[:, None]], axis=1).tolist())
    )


@pytest.mark.parametrize("min_neighbors", [0, 1, 2])
def test_native_group_rectangles_matches_numpy(min_neighbors, rng):
    for _ in range(6):
        rects = _random_clusters(
            rng, rng.randint(1, 5), rng.randint(1, 6), jitter=4
        )
        py_r, py_w = nms.group_rectangles(rects, min_neighbors)
        nat = native.group_rectangles(rects, min_neighbors)
        assert nat is not None
        assert _sets(nat[0], nat[1]) == _sets(py_r, py_w)


def test_native_group_rectangles_empty():
    out = native.group_rectangles(np.zeros((0, 4)), 1)
    assert out is not None
    assert len(out[0]) == 0


def test_native_pyramid_matches_python():
    cases = [
        (480, 640, 48, 48, 0.075, 1.1),
        (480, 640, 12, 12, 0.075, 1.005),
        (333, 517, 24, 24, 0.1, 1.25),
    ]
    for img_h, img_w, wh, ww, mwl, f in cases:
        plan = pyramid.build_plan(img_h, img_w, wh, ww, mwl, f)
        rows = native.enumerate_pyramid(img_h, img_w, wh, ww, mwl, f)
        assert rows is not None
        assert len(rows) == plan.n_scales
        for row, spec in zip(rows, plan.scales):
            assert row[0] == spec.scale
            assert int(row[1]) == spec.scaled_h
            assert int(row[2]) == spec.scaled_w
            assert int(row[3]) == spec.step_x
            assert int(row[4]) == spec.step_y
            assert int(row[5]) == spec.n_windows


def test_fast_wrapper_uses_some_backend(rng):
    rects = _random_clusters(rng, 2, 4, 3)
    r, w = nms.group_rectangles_fast(rects, 1)
    r2, w2 = nms.group_rectangles(rects, 1)
    assert _sets(r, w) == _sets(r2, w2)
