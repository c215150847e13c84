"""Pyramid schedule parity vs a direct transliteration of the reference's
window-enumeration loops (data/rectangles.py:309-435)."""

import numpy as np
import pytest

from rapidobjectdetectionusingcascadedcnns_tpu.ops import pyramid


def oracle_windows(img_h, img_w, window_h, window_w, min_window_length, factor):
    """Nested-while-loop oracle mirroring the reference control flow exactly:
    scale loop (skip while too big), step rule, strict float bounds, x-outer /
    y-inner ordering."""
    windows = []  # (scale, xmin, ymin, xmax, ymax)
    scale = 1.0
    h, w = float(img_h), float(img_w)
    max_img_length = (1.0 / min_window_length) * window_w
    while True:
        if w < max_img_length and h < max_img_length:
            step_x = max(min(int(0.4 * window_w), int(0.1 * w)), 1)
            step_y = max(min(int(0.4 * window_h), int(0.1 * h)), 1)
            xmin = -step_x
            while True:
                xmin += step_x
                xmax = xmin + window_w
                if xmax >= w:
                    break
                ymin = -step_y
                while True:
                    ymin += step_y
                    ymax = ymin + window_h
                    if ymax >= h:
                        break
                    windows.append((scale, xmin, ymin, xmax, ymax))
        scale /= factor
        h /= factor
        w /= factor
        if h < window_h or w < window_w:
            break
    return windows


CASES = [
    (480, 640, 48, 48, 0.075, 1.1),  # VGA default config
    (480, 640, 12, 12, 0.075, 1.1),  # stage-0 cascade resolution
    (333, 517, 48, 48, 0.075, 1.1),  # odd dims
    (100, 100, 48, 48, 0.075, 1.5),
    (250, 200, 24, 24, 0.1, 1.25),
    (60, 60, 48, 48, 0.075, 1.1),  # barely above window size
]


@pytest.mark.parametrize("img_h,img_w,wh,ww,mwl,f", CASES)
def test_plan_matches_oracle(img_h, img_w, wh, ww, mwl, f):
    plan = pyramid.build_plan(img_h, img_w, wh, ww, mwl, f)
    table = pyramid.window_table(plan)
    oracle = oracle_windows(img_h, img_w, wh, ww, mwl, f)

    assert plan.n_windows == len(oracle)
    if not oracle:
        return
    o_scales = np.array([o[0] for o in oracle])
    o_coords = np.array([[o[1], o[2], o[3], o[4]] for o in oracle], dtype=np.int32)
    np.testing.assert_allclose(table["scales"], o_scales, rtol=0, atol=0)
    np.testing.assert_array_equal(table["coords"], o_coords)


def test_norm_coords_truncate_like_reference():
    plan = pyramid.build_plan(480, 640, 48, 48, 0.075, 1.1)
    table = pyramid.window_table(plan)
    coords = table["coords"]
    scales = table["scales"]
    expected = np.stack(
        [
            np.array([int(c / s) for c, s in zip(coords[:, k], scales)], dtype=np.int32)
            for k in range(4)
        ],
        axis=1,
    )
    np.testing.assert_array_equal(table["coords_norm"], expected)


def test_windows_fit_in_scaled_image():
    """Every window must fit within int-truncated scaled image dims so the
    device gather never reads out of bounds."""
    for case in CASES:
        plan = pyramid.build_plan(*case)
        for s in plan.scales:
            assert max(s.xs) + plan.window_w <= s.scaled_w
            assert max(s.ys) + plan.window_h <= s.scaled_h


def test_fddb_density_plan_is_large():
    # scale factor 1.005 (app/evaluate_fddb_app.py:34) => very dense pyramid
    plan = pyramid.build_plan(480, 640, 12, 12, 0.075, 1.005)
    assert plan.n_windows > 50_000
    assert plan.n_scales > 100


def test_plan_is_hashable_and_cached():
    p1 = pyramid.build_plan(480, 640, 48, 48, 0.075, 1.1)
    p2 = pyramid.build_plan(480, 640, 48, 48, 0.075, 1.1)
    assert p1 is p2  # lru_cache
    hash(p1)  # usable as jit static arg
