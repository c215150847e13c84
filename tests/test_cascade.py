"""Cascade inference engine: shape/compaction/threshold semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
from rapidobjectdetectionusingcascadedcnns_tpu.data import synthetic
from rapidobjectdetectionusingcascadedcnns_tpu.models import cascade


@pytest.fixture
def small_cascade():
    """Tiny random 3-stage cascade on 12/24/48 inputs."""
    cf.set("conv_filter_sizes", [8])
    cf.set("fc1_size", 32)
    cf.set("compute_dtype", "float32")
    return cascade.build_cascade_model(seed=0)


def test_capacity_schedule_defaults():
    caps = cascade.default_capacity_schedule(20000, 3)
    assert len(caps) == 2
    assert caps[0] >= caps[1]
    assert all(c % 128 == 0 for c in caps)
    assert caps[0] <= 20000
    # sized for trained cascades (~1/8 survivors + headroom); saturation
    # re-dispatch covers anything beyond
    assert caps[0] == 2560
    # tiny pyramids keep everything
    caps_small = cascade.default_capacity_schedule(100, 3)
    assert caps_small == [100, 100]


def test_resolve_thresholds_scalar_and_list():
    cf.set("foreground_confidence_threshold", 0.5)
    assert cascade.resolve_thresholds(3) == [0.5, 0.5, 0.5]
    cf.set("foreground_confidence_threshold", [0.3, 0.5, 0.7])
    assert cascade.resolve_thresholds(3) == [0.3, 0.5, 0.7]
    cf.set("foreground_confidence_threshold", [0.3, 0.5])
    with pytest.raises(ValueError):
        cascade.resolve_thresholds(3)


def test_detect_runs_end_to_end(small_cascade):
    scene = synthetic.make_scene(100, 100, n_faces=1, seed=3, min_face=40, max_face=60)
    det = cascade.CascadeDetector(small_cascade)
    result = det.detect(scene.image)
    assert result.n_windows > 0
    assert len(result.n_survivors_per_stage) == 3
    # survivor counts are monotone non-increasing through the cascade
    s = result.n_survivors_per_stage
    assert s[0] >= s[1] >= s[2]
    assert result.raw_boxes.shape[1] == 4
    assert len(result.raw_boxes) == len(result.raw_confidences)
    assert (result.raw_confidences > 0).all()


def test_threshold_one_rejects_everything(small_cascade):
    cf.set("foreground_confidence_threshold", 1.0)  # p > 1.0 is impossible
    scene = synthetic.make_scene(100, 100, n_faces=1, seed=5, min_face=40, max_face=50)
    det = cascade.CascadeDetector(small_cascade)
    result = det.detect(scene.image)
    assert result.n_survivors_per_stage[0] == 0
    assert len(result.raw_boxes) == 0
    assert len(result.boxes) == 0


def test_threshold_zero_keeps_everything_stage0(small_cascade):
    cf.set("foreground_confidence_threshold", 0.0)
    cf.set("nms", cf.NMS_DISABLED)
    scene = synthetic.make_scene(100, 100, n_faces=1, seed=5, min_face=40, max_face=50)
    det = cascade.CascadeDetector(small_cascade)
    result = det.detect(scene.image)
    # softmax probs are strictly positive => everything passes stage 0
    assert result.n_survivors_per_stage[0] == result.n_windows


def test_raw_boxes_are_valid_image_regions(small_cascade):
    cf.set("foreground_confidence_threshold", 0.0)
    cf.set("nms", cf.NMS_DISABLED)
    scene = synthetic.make_scene(100, 100, n_faces=1, seed=7, min_face=40, max_face=50)
    det = cascade.CascadeDetector(small_cascade)
    result = det.detect(scene.image)
    b = result.raw_boxes
    assert (b[:, 0] < b[:, 2]).all() and (b[:, 1] < b[:, 3]).all()
    assert (b[:, 0] >= 0).all() and (b[:, 1] >= 0).all()
    assert (b[:, 2] <= 100).all() and (b[:, 3] <= 100).all()


def test_confidence_modes(small_cascade):
    scene = synthetic.make_scene(100, 100, n_faces=1, seed=9, min_face=40, max_face=50)
    cf.set("foreground_confidence_threshold", 0.0)
    cf.set("nms", cf.NMS_DISABLED)
    det = cascade.CascadeDetector(small_cascade)

    cf.set("final_confidence_calculation", cf.FINAL_CONFIDENCE_CALCULATION_LAST_STEP)
    last = det.detect(scene.image)
    cf.set("final_confidence_calculation", cf.FINAL_CONFIDENCE_CALCULATION_AVG)
    avg = det.detect(scene.image)
    cf.set("final_confidence_calculation", cf.FINAL_CONFIDENCE_CALCULATION_MULT)
    mult = det.detect(scene.image)

    assert (last.raw_confidences <= 1.0).all()
    assert (avg.raw_confidences <= 1.0).all()
    # MULT clamps at the documented floor (config.py:121)
    assert (
        mult.raw_confidences
        >= cf.MIN_SCORE_FOR_FINAL_CONFIDENCE_CALCULATION_MULT - 1e-6
    ).all()


def test_is_saturated_logic():
    # stage-0 alive count exceeds the capacity -> windows were truncated
    assert cascade.CascadeDetector._is_saturated([600, 10, 5], (512, 256))
    # exactly filled buffer drops nothing
    assert not cascade.CascadeDetector._is_saturated([512, 10, 5], (512, 256))
    assert not cascade.CascadeDetector._is_saturated([1000, 10, 5], (1000, 256))
    # stage-1 truncation
    assert cascade.CascadeDetector._is_saturated([400, 300, 5], (512, 256))
    assert not cascade.CascadeDetector._is_saturated([400, 256, 5], (512, 256))


def test_saturation_redispatch_matches_unbounded(small_cascade):
    """A degenerate stage 0 (threshold 0 => everything survives) saturates the
    default capacities; re-dispatch must recover the same detection set as an
    unbounded run (the reference's semantics,
    app/inference_cascade_app.py:217-240)."""
    cf.set("foreground_confidence_threshold", 0.0)
    cf.set("nms", cf.NMS_OPENCV)
    cf.set("nms_opencv_min_neighbors", 1)
    scene = synthetic.make_scene(64, 64, n_faces=1, seed=21, min_face=30, max_face=40)

    det = cascade.CascadeDetector(small_cascade)
    res = det.detect(scene.image)
    n_windows = res.n_windows
    caps = cascade.default_capacity_schedule(n_windows, 3)
    assert any(c < n_windows for c in caps), "fixture must actually saturate"

    unbounded = cascade.CascadeDetector(
        small_cascade, capacity_schedule=[n_windows, n_windows]
    )
    ref = unbounded.detect(scene.image)

    assert sorted(map(tuple, res.boxes.tolist())) == sorted(
        map(tuple, ref.boxes.tolist())
    )
    assert sorted(res.confidences.tolist()) == sorted(ref.confidences.tolist())
    assert sorted(map(tuple, res.raw_boxes.tolist())) == sorted(
        map(tuple, ref.raw_boxes.tolist())
    )


def test_saturation_redispatch_can_be_disabled(small_cascade):
    cf.set("foreground_confidence_threshold", 0.0)
    cf.set("nms", cf.NMS_DISABLED)
    cf.set("cascade_saturation_redispatch", False)
    scene = synthetic.make_scene(64, 64, n_faces=1, seed=23, min_face=30, max_face=40)
    det = cascade.CascadeDetector(small_cascade)
    res = det.detect(scene.image)
    caps = cascade.default_capacity_schedule(res.n_windows, 3)
    # truncation really happened: surviving raw set is capped
    assert len(res.raw_boxes) <= caps[-1] < res.n_windows
    assert det._saturation_warned


def test_plan_cache_invalidates_on_config_change(small_cascade):
    """Changing pyramid geometry between detects must take effect (the round-1
    lru_cache snapshot bug): EvaluateFDDBApp mutates window_scale_factor."""
    scene = synthetic.make_scene(64, 64, n_faces=1, seed=25, min_face=30, max_face=40)
    det = cascade.CascadeDetector(small_cascade)
    cf.set("window_scale_factor", 1.4)
    coarse = det.detect(scene.image)
    cf.set("window_scale_factor", 1.1)
    dense = det.detect(scene.image)
    assert dense.n_windows > coarse.n_windows


def test_nms_groups_overlapping_detections(small_cascade):
    cf.set("foreground_confidence_threshold", 0.0)
    cf.set("nms", cf.NMS_OPENCV)
    cf.set("nms_opencv_min_neighbors", 1)
    scene = synthetic.make_scene(100, 100, n_faces=1, seed=11, min_face=40, max_face=50)
    det = cascade.CascadeDetector(small_cascade)
    result = det.detect(scene.image)
    # with threshold 0 everything survives; NMS must cluster heavily
    assert len(result.boxes) < len(result.raw_boxes)


def test_vertical_enlargement_applied(small_cascade):
    cf.set("foreground_confidence_threshold", 0.0)
    cf.set("nms", cf.NMS_DISABLED)
    scene = synthetic.make_scene(100, 100, n_faces=1, seed=13, min_face=40, max_face=50)
    det = cascade.CascadeDetector(small_cascade)
    plain = det.detect(scene.image)
    cf.set("vertically_enlarge_bboxes", True)
    enlarged = det.detect(scene.image)
    assert (enlarged.boxes[:, 1] <= plain.boxes[:, 1]).all()
    assert (enlarged.boxes[:, 1] < plain.boxes[:, 1]).any()
