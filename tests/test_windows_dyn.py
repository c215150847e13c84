"""Dynamic (survivor-box) support-bounded re-extraction: parity vs the XLA
path, big-class fallback, overflow accounting, cascade integration
(verdict r2 item 3). Interpret mode on CPU."""

import numpy as np
import pytest

import jax.numpy as jnp

from rapidobjectdetectionusingcascadedcnns_tpu.ops import windows, windows_dyn
from rapidobjectdetectionusingcascadedcnns_tpu.ops.pyramid import (
    build_plan,
    window_table,
)


def _assert_quantized_parity(got, ref, max_frac=1e-3):
    got = np.asarray(got, np.float32)
    ref = np.asarray(ref, np.float32)
    neq = got != ref
    assert np.abs(got - ref).max(initial=0.0) <= 1.0 + 1e-6
    assert neq.mean() <= max_frac, f"{neq.sum()}/{ref.size} elements differ"


@pytest.fixture(scope="module")
def scene640():
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.randint(0, 256, (480, 640, 3)).astype(np.float32))


def _survivor_boxes(n, seed=1, img_h=480, img_w=640):
    """Random survivor-like boxes spanning the pyramid's size range."""
    rng = np.random.RandomState(seed)
    plan = build_plan(img_h, img_w, 12, 12, 0.075, 1.1)
    table = window_table(plan)
    sel = rng.choice(plan.n_windows, size=n, replace=False)
    return jnp.asarray(table["coords_norm"][sel].astype(np.float32))


def test_dyn_supported_gate():
    assert windows_dyn.dyn_supported(480, 640, 24, 24, 1024)
    assert not windows_dyn.dyn_supported(100, 120, 24, 24, 1024)  # small img
    assert not windows_dyn.dyn_supported(480, 640, 24, 24, 8)  # tiny batch


def test_matches_xla_at_stage1_geometry(scene640):
    boxes = _survivor_boxes(512)
    big_cap = windows_dyn.default_big_cap(512, 24, 24, 480)
    got, n_big, ovf = windows_dyn.extract_rowbound(
        scene640, boxes, 24, 24, big_cap=big_cap, interpret=True
    )
    assert int(ovf) == 0
    # a healthy share must ride the small (row-bounded) path
    assert int(n_big) < 0.5 * 512, int(n_big)
    ref = windows.crop_and_resize(scene640, boxes, out_h=24, out_w=24)
    _assert_quantized_parity(got, ref)


def test_matches_xla_at_stage2_geometry(scene640):
    boxes = _survivor_boxes(256, seed=3)
    big_cap = windows_dyn.default_big_cap(256, 48, 48, 480)
    got, n_big, ovf = windows_dyn.extract_rowbound(
        scene640, boxes, 48, 48, big_cap=big_cap, interpret=True
    )
    assert int(ovf) == 0
    ref = windows.crop_and_resize(scene640, boxes, out_h=48, out_w=48)
    _assert_quantized_parity(got, ref)


def test_tall_windows_ride_big_class(scene640):
    """Boxes taller than the row rung MUST be served by the big class and
    still match the reference path."""
    rng = np.random.RandomState(4)
    n = 64
    y0 = rng.uniform(0, 100, n).astype(np.float32)
    hgt = rng.uniform(200, 400, n).astype(np.float32)
    x0 = rng.uniform(0, 300, n).astype(np.float32)
    boxes = np.stack(
        [x0, y0, np.minimum(x0 + hgt, 640), np.minimum(y0 + hgt, 480)], axis=1
    )
    big_cap = windows_dyn.default_big_cap(n, 24, 24, 480)
    got, n_big, ovf = windows_dyn.extract_rowbound(
        scene640, jnp.asarray(boxes), 24, 24, big_cap=big_cap, interpret=True
    )
    assert int(n_big) == n  # all tall
    assert int(ovf) == max(0, n - big_cap)  # 0 with the demotion-aware cap
    ref = windows.crop_and_resize(scene640, jnp.asarray(boxes), out_h=24, out_w=24)
    _assert_quantized_parity(got, ref)


def test_overflow_counted_when_big_cap_too_small(scene640):
    rng = np.random.RandomState(5)
    n = 64
    y0 = rng.uniform(0, 50, n).astype(np.float32)
    boxes = np.stack(
        [y0 * 0 + 10, y0, y0 * 0 + 400, np.minimum(y0 + 300, 480)], axis=1
    )
    tile = 16  # _tile_windows(24, 24)
    got, n_big, ovf = windows_dyn.extract_rowbound(
        scene640, jnp.asarray(boxes), 24, 24, big_cap=tile, interpret=True
    )
    assert int(n_big) == n
    assert int(ovf) == n - tile


def test_padding_replicas_not_counted_as_big(scene640):
    """N not a tile multiple with a BIG last sorted window: the tile-padding
    replicas (appended after the sort, so they replicate that big window)
    must not inflate n_big/overflow — all real windows fit, so no overflow,
    and extraction still matches the reference path."""
    rng = np.random.RandomState(6)
    n = 65  # tile=16 -> n_pad=80: 15 replicas of the last sorted window
    n_tall = 10
    y0 = rng.uniform(0, 100, n).astype(np.float32)
    hgt = np.concatenate(
        [
            rng.uniform(30, 60, n - n_tall),  # small class
            rng.uniform(300, 400, n_tall),  # big class (sorted last)
        ]
    ).astype(np.float32)
    x0 = rng.uniform(0, 200, n).astype(np.float32)
    boxes = np.stack(
        [x0, y0, np.minimum(x0 + hgt, 640), np.minimum(y0 + hgt, 480)], axis=1
    )
    # real big class: the 10 tall windows + tile-cell-fragmented small ones
    # (measured 20 at this seed) — 32 holds all of them but NOT the 15 big
    # padding replicas on top, so the pre-fix counting reports a spurious
    # overflow here while the fixed counting reports none
    big_cap = 32
    got, n_big, ovf = windows_dyn.extract_rowbound(
        scene640, jnp.asarray(boxes), 24, 24, big_cap=big_cap, interpret=True
    )
    assert int(n_big) <= n  # replicas excluded (tall ones may still demote)
    assert int(n_big) >= n_tall
    assert int(ovf) == 0
    ref = windows.crop_and_resize(scene640, jnp.asarray(boxes), out_h=24, out_w=24)
    _assert_quantized_parity(got, ref)


def test_cascade_uses_dyn_and_redispatches_on_overflow(monkeypatch):
    """End-to-end: a big image under 'pallas2' + dyn_reextract='on' routes
    stage-1/2 re-extraction through the dynamic kernel; detections match the
    XLA path, and a forced big-class overflow triggers the v1 re-dispatch
    instead of garbage."""
    from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
    from rapidobjectdetectionusingcascadedcnns_tpu.data import synthetic
    from rapidobjectdetectionusingcascadedcnns_tpu.models import cascade as casc

    with cf.overrides(
        conv_filter_sizes=[8],
        fc1_size=32,
        cascade_n_nets=2,
        img_width=24,
        compute_dtype="float32",
        window_scale_factor=1.25,
        min_window_length=0.075,
        window_extraction_mode="crop",
        nms=cf.NMS_DISABLED,
    ):
        model = casc.build_cascade_model(seed=3)
        img = synthetic.make_scene(320, 384, 2, seed=9, min_face=60, max_face=90).image

        with cf.overrides(use_pallas_resample="xla"):
            det_x = casc.CascadeDetector(model).detect(img)
        with cf.overrides(use_pallas_resample="pallas2", dyn_reextract="on"):
            det_p = casc.CascadeDetector(model).detect(img)
        assert det_p.reextract_overflows == [0]
        ids_x = set(np.asarray(det_x.raw_window_ids).tolist())
        ids_p = set(np.asarray(det_p.raw_window_ids).tolist())
        assert len(ids_x ^ ids_p) <= max(2, 0.02 * max(1, len(ids_x)))

        # force an overflow: pin the big class to one tile; capacity
        # escalation cannot fix it (the patched default ignores cap), so the
        # detector must fall back to the always-correct v1 re-dispatch
        from rapidobjectdetectionusingcascadedcnns_tpu.ops import windows_dyn

        monkeypatch.setattr(
            windows_dyn, "default_big_cap", lambda cap, oh, ow, img_h: 16
        )
        with cf.overrides(use_pallas_resample="pallas2", dyn_reextract="on"):
            det_f = casc.CascadeDetector(model).detect(img)
        ids_f = set(np.asarray(det_f.raw_window_ids).tolist())
        assert len(ids_x ^ ids_f) <= max(2, 0.02 * max(1, len(ids_x)))
