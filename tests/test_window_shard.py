"""Window-axis sharding of one image's cascade over an 8-device mesh:
detections must be IDENTICAL to the single-device program (per-window math
is neighbor-independent, so sharding the window batch cannot change any
window's result). SURVEY.md §2.6 item 2."""

import jax
import numpy as np
import pytest

from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
from rapidobjectdetectionusingcascadedcnns_tpu.data import synthetic
from rapidobjectdetectionusingcascadedcnns_tpu.models import cascade
from rapidobjectdetectionusingcascadedcnns_tpu.parallel import mesh as mesh_mod
from rapidobjectdetectionusingcascadedcnns_tpu.parallel import window_shard


@pytest.fixture(scope="module")
def mesh8():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    return mesh_mod.get_mesh(8)


@pytest.fixture
def small_cascade():
    cf.set("conv_filter_sizes", [8])
    cf.set("fc1_size", 32)
    cf.set("compute_dtype", "float32")
    cf.set("nms", cf.NMS_OPENCV)
    cf.set("nms_opencv_min_neighbors", 1)
    cf.set("foreground_confidence_threshold", 0.5)
    return cascade.build_cascade_model(seed=0)


def test_sharded_detections_match_single_device(mesh8, small_cascade):
    # a dense-ish plan (scale factor 1.02) so the window axis is worth
    # splitting: the FDDB-density regime at test-friendly size. Saturation
    # re-dispatch stays ON — both paths now share the escalation semantics.
    cf.set("window_scale_factor", 1.02)
    cf.set("window_extraction_mode", "crop")
    cf.set("cascade_saturation_redispatch", True)
    scene = synthetic.make_scene(100, 120, n_faces=2, seed=5, min_face=30, max_face=50)

    det = cascade.CascadeDetector(small_cascade)
    single = det.detect(scene.image)
    assert single.n_windows > 8000  # actually dense

    sharded = window_shard.detect_window_sharded(det, scene.image, mesh8)

    assert sharded.n_windows == single.n_windows
    assert sharded.n_survivors_per_stage == single.n_survivors_per_stage
    assert sorted(map(tuple, sharded.raw_boxes.tolist())) == sorted(
        map(tuple, single.raw_boxes.tolist())
    )
    np.testing.assert_allclose(
        np.sort(sharded.raw_confidences), np.sort(single.raw_confidences), atol=0
    )
    assert sorted(map(tuple, sharded.boxes.tolist())) == sorted(
        map(tuple, single.boxes.tolist())
    )


def test_sharded_detections_match_single_device_gather_mode(mesh8, small_cascade):
    """Gather extraction (the coarse-pyramid mode VGA frames resolve to):
    the replicated per-level resize+gather window tensor is re-sharded over
    the window axis before the CNN; survivor SETS, window ids and integer
    boxes must be identical to the single-device gather program, and
    confidences within 2 ulp of float32 (verdict r2 weak item 2).

    Why not atol=0 like the crop test: at 8 shards the full program's fusion
    context shifts one softmax by 1 ulp (isolated extraction, stage-0 CNN,
    and stage-1 crop+CNN all reproduce bit-exactly at any shard count, and
    the whole program is bit-exact on 1- and 2-device meshes — the drift is
    an XLA fusion-boundary artifact, not an algorithmic divergence)."""
    cf.set("window_scale_factor", 1.1)
    cf.set("window_extraction_mode", "gather")
    cf.set("cascade_saturation_redispatch", True)
    try:
        scene = synthetic.make_scene(
            100, 120, n_faces=2, seed=7, min_face=30, max_face=50
        )
        det = cascade.CascadeDetector(small_cascade)
        single = det.detect(scene.image)
        assert single.n_windows > 500

        sharded = window_shard.detect_window_sharded(det, scene.image, mesh8)

        assert sharded.n_windows == single.n_windows
        assert sharded.n_survivors_per_stage == single.n_survivors_per_stage
        assert sorted(sharded.raw_window_ids.tolist()) == sorted(
            single.raw_window_ids.tolist()
        )
        assert sorted(map(tuple, sharded.raw_boxes.tolist())) == sorted(
            map(tuple, single.raw_boxes.tolist())
        )
        np.testing.assert_allclose(
            np.sort(sharded.raw_confidences), np.sort(single.raw_confidences),
            atol=2.4e-7,
        )
        assert sorted(map(tuple, sharded.boxes.tolist())) == sorted(
            map(tuple, single.boxes.tolist())
        )
    finally:
        cf.set("window_extraction_mode", "auto")


def test_sharded_saturation_redispatch_matches_single_device(mesh8, small_cascade):
    """A scene engineered to saturate (threshold 0 keeps EVERY window alive,
    with a deliberately tiny capacity schedule) must re-dispatch with doubled
    capacities on the sharded path exactly like the single-device path, and
    end with identical, untruncated survivor sets (verdict r2 item 2a)."""
    cf.set("window_scale_factor", 1.1)
    cf.set("window_extraction_mode", "crop")
    cf.set("cascade_saturation_redispatch", True)
    cf.set("foreground_confidence_threshold", 0.0)  # everything survives
    cf.set("cascade_capacity_schedule", [128, 128])
    try:
        scene = synthetic.make_scene(
            100, 120, n_faces=1, seed=11, min_face=40, max_face=60
        )
        det = cascade.CascadeDetector(small_cascade)
        single = det.detect(scene.image)
        # the engineered schedule really saturates: re-dispatch opened it up
        assert single.n_survivors_per_stage[0] > 128
        assert single.n_survivors_per_stage[0] == single.n_windows

        det2 = cascade.CascadeDetector(small_cascade)
        sharded = window_shard.detect_window_sharded(det2, scene.image, mesh8)
        assert sharded.n_survivors_per_stage == single.n_survivors_per_stage
        assert sorted(map(tuple, sharded.raw_boxes.tolist())) == sorted(
            map(tuple, single.raw_boxes.tolist())
        )
        np.testing.assert_allclose(
            np.sort(sharded.raw_confidences), np.sort(single.raw_confidences),
            atol=0,
        )
    finally:
        cf.set("cascade_capacity_schedule", None)
        cf.set("foreground_confidence_threshold", 0.5)


def test_sharded_redispatch_off_warns_and_truncates(mesh8, small_cascade):
    """With re-dispatch disabled the sharded path truncates (round-1
    behavior) but must say so in the log instead of silently."""
    from rapidobjectdetectionusingcascadedcnns_tpu.utils import log as log_mod

    cf.set("window_scale_factor", 1.1)
    cf.set("window_extraction_mode", "crop")
    cf.set("cascade_saturation_redispatch", False)
    cf.set("foreground_confidence_threshold", 0.0)
    cf.set("cascade_capacity_schedule", [128, 128])
    try:
        scene = synthetic.make_scene(
            100, 120, n_faces=1, seed=11, min_face=40, max_face=60
        )
        det = cascade.CascadeDetector(small_cascade)
        before = len(log_mod.log_lines())
        res = window_shard.detect_window_sharded(det, scene.image, mesh8)
        assert res.n_survivors_per_stage[0] > 128  # saturated
        assert len(res.raw_boxes) <= 128  # and truncated
        tail = "\n".join(log_mod.log_lines()[before:])
        assert "saturated" in tail
    finally:
        cf.set("cascade_capacity_schedule", None)
        cf.set("foreground_confidence_threshold", 0.5)
        cf.set("cascade_saturation_redispatch", True)


def test_sharded_result_is_actually_sharded(mesh8, small_cascade):
    """The stage-0 output really is partitioned over the mesh (not silently
    replicated): probe the jitted program's sharding via the compiled
    lowering of the shard_map section."""
    cf.set("window_scale_factor", 1.1)
    scene = synthetic.make_scene(100, 100, n_faces=1, seed=9, min_face=40, max_face=60)
    det = cascade.CascadeDetector(small_cascade)
    plan, table, coords_norm, boxes_float = det._plan_and_table(100, 100)

    # pad + shard the window boxes over the mesh and confirm placement
    n_dev = mesh8.devices.size
    n_pad = ((plan.n_windows + n_dev - 1) // n_dev) * n_dev
    boxes_p = np.concatenate(
        [
            np.asarray(boxes_float),
            np.broadcast_to(np.asarray(boxes_float)[-1:], (n_pad - plan.n_windows, 4)),
        ]
    )
    placed = mesh_mod.shard_batch(mesh8, boxes_p)
    assert len(placed.sharding.device_set) == n_dev
    # each device holds 1/n_dev of the window axis
    shard_rows = {s.data.shape[0] for s in placed.addressable_shards}
    assert shard_rows == {n_pad // n_dev}
