"""Scan-vs-rank survivor compaction: the O(n) cumsum+searchsorted selection
("scan") must produce identical detections to the full strength argsort
("rank") whenever the survivor buffers do not truncate — and saturation
re-dispatch (on by default) guarantees they never do. The scan order is the
reference's own survivor order (app/inference_cascade_app.py:217-240 appends
survivors in window-enumeration order)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
from rapidobjectdetectionusingcascadedcnns_tpu.data import synthetic
from rapidobjectdetectionusingcascadedcnns_tpu.models import cascade


@pytest.fixture
def small_cascade():
    cf.set("conv_filter_sizes", [8])
    cf.set("fc1_size", 32)
    cf.set("compute_dtype", "float32")
    cf.set("nms", cf.NMS_OPENCV)
    cf.set("nms_opencv_min_neighbors", 1)
    cf.set("foreground_confidence_threshold", 0.5)
    return cascade.build_cascade_model(seed=0)


def _detect(model, image, mode):
    cf.set("cascade_compaction", mode)
    try:
        det = cascade.CascadeDetector(model)
        return det.detect(image)
    finally:
        cf.set("cascade_compaction", "auto")


def test_unit_compact_indices_matches_selection():
    alive = jnp.asarray(
        [False, True, False, True, True, False, False, True, False]
    )
    p = jnp.linspace(0.9, 0.1, alive.shape[0])
    keep, alive_out = cascade._compact_indices(alive, p, 6, "scan")
    # alive rows in window order, then padding marked dead
    assert [int(k) for k in np.asarray(keep)[:4]] == [1, 3, 4, 7]
    assert list(np.asarray(alive_out)) == [True] * 4 + [False] * 2
    # rank keeps the same SET when nothing truncates
    keep_r, alive_r = cascade._compact_indices(alive, p, 6, "rank")
    assert sorted(np.asarray(keep_r)[np.asarray(alive_r)].tolist()) == [
        1, 3, 4, 7,
    ]


def test_unit_compact_indices_truncation_semantics():
    alive = jnp.asarray([True] * 8)
    p = jnp.asarray([0.1, 0.9, 0.2, 0.8, 0.3, 0.7, 0.4, 0.6])
    # scan: first-cap in window order
    keep, alive_out = cascade._compact_indices(alive, p, 4, "scan")
    assert [int(k) for k in np.asarray(keep)] == [0, 1, 2, 3]
    assert bool(np.all(np.asarray(alive_out)))
    # rank: strongest-cap
    keep_r, _ = cascade._compact_indices(alive, p, 4, "rank")
    assert sorted(np.asarray(keep_r).tolist()) == [1, 3, 5, 7]


def test_detections_identical_scan_vs_rank(small_cascade):
    cf.set("window_scale_factor", 1.05)
    scene = synthetic.make_scene(
        120, 160, n_faces=2, seed=3, min_face=30, max_face=60
    )
    a = _detect(small_cascade, scene.image, "rank")
    b = _detect(small_cascade, scene.image, "scan")
    assert a.n_survivors_per_stage == b.n_survivors_per_stage
    assert sorted(map(tuple, a.raw_boxes.tolist())) == sorted(
        map(tuple, b.raw_boxes.tolist())
    )
    np.testing.assert_allclose(
        np.sort(a.raw_confidences), np.sort(b.raw_confidences), atol=0
    )
    assert sorted(map(tuple, a.boxes.tolist())) == sorted(
        map(tuple, b.boxes.tolist())
    )


def test_scan_redispatch_still_untruncated(small_cascade):
    """Engineered saturation (threshold 0, tiny caps): the scan path's
    re-dispatch must open the buffers exactly like rank's."""
    cf.set("window_scale_factor", 1.1)
    cf.set("foreground_confidence_threshold", 0.0)
    cf.set("cascade_capacity_schedule", [128, 128])
    cf.set("cascade_saturation_redispatch", True)
    # threshold 0 keeps EVERY window (~3.4k here): enough retries that the
    # doubling loop fully opens the buffers — with retries exhausted early,
    # rank keeps the strongest truncation and scan the first-N one (the
    # documented corner, config.py cascade_compaction)
    cf.set("cascade_saturation_max_retries", 6)
    try:
        scene = synthetic.make_scene(
            100, 120, n_faces=1, seed=11, min_face=40, max_face=60
        )
        a = _detect(small_cascade, scene.image, "rank")
        b = _detect(small_cascade, scene.image, "scan")
        assert a.n_survivors_per_stage[0] == a.n_windows  # really saturated
        assert a.n_survivors_per_stage == b.n_survivors_per_stage
        assert sorted(map(tuple, a.raw_boxes.tolist())) == sorted(
            map(tuple, b.raw_boxes.tolist())
        )
    finally:
        cf.set("cascade_capacity_schedule", None)
        cf.set("foreground_confidence_threshold", 0.5)
        cf.set("cascade_saturation_max_retries", 4)


def test_resolution_follows_redispatch():
    cf.set("cascade_compaction", "auto")
    cf.set("cascade_saturation_redispatch", True)
    assert cascade.resolve_compaction() == "scan"
    cf.set("cascade_saturation_redispatch", False)
    assert cascade.resolve_compaction() == "rank"
    cf.set("cascade_compaction", "rank")
    cf.set("cascade_saturation_redispatch", True)
    assert cascade.resolve_compaction() == "rank"
    cf.set("cascade_compaction", "auto")
    cf.set("cascade_saturation_redispatch", True)
