"""SingleNetDetector: density-scalable extraction paths and plan caching.

The single net is the reference's InferenceApp path (classify EVERY pyramid
window with one CNN, app/inference_app.py:117-154). It now shares the
cascade's dense stage-0 machinery (models/cascade._stage0_apply), so these
tests pin: crop-mode == gather-mode semantics, chunked == unchunked
exactness, pipelined multi-batch consistency, and the config-keyed pyramid
plan cache (a stale (h, w)-keyed cache would serve wrong geometry when
window_scale_factor changes between detects — the FDDB harness does exactly
that)."""

import numpy as np
import pytest

from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
from rapidobjectdetectionusingcascadedcnns_tpu.data import synthetic
from rapidobjectdetectionusingcascadedcnns_tpu.models import cnn
from rapidobjectdetectionusingcascadedcnns_tpu.models.single import SingleNetDetector


@pytest.fixture(autouse=True)
def _reset_config():
    cf.reset()
    cf.set("conv_filter_sizes", [8])
    cf.set("fc1_size", 32)
    cf.set("compute_dtype", "float32")
    yield
    cf.reset()


@pytest.fixture()
def detector():
    import jax

    scfg = cnn.StageConfig.from_config(24, bottleneck_in_size=None)
    params = cnn.init_stage(jax.random.PRNGKey(0), scfg)
    return SingleNetDetector(
        params,
        scfg,
        np.full((24, 24, 3), 127.5, np.float32),
        np.full((24, 24, 3), 64.0, np.float32),
    )


def test_crop_mode_matches_gather_mode(detector):
    """The dense-pyramid crop path classifies the same windows as the
    per-level gather path; borderline float flips are bounded (the two
    resamplers share taps but not reduction order)."""
    scene = synthetic.make_scene(100, 120, n_faces=1, seed=5, min_face=40, max_face=60)
    cf.set("window_extraction_mode", "gather")
    g = detector.detect(scene.image)
    cf.set("window_extraction_mode", "crop")
    c = detector.detect(scene.image)
    assert g.n_windows == c.n_windows
    assert abs(g.n_survivors_per_stage[0] - c.n_survivors_per_stage[0]) <= max(
        5, int(0.01 * g.n_windows)
    )


def test_chunked_equals_unchunked(detector):
    """lax.map window chunking must not change a single classification."""
    scene = synthetic.make_scene(100, 120, n_faces=1, seed=5, min_face=40, max_face=60)
    cf.set("window_extraction_mode", "crop")
    cf.set("inference_chunk_size", 10 ** 9)
    whole = detector.detect(scene.image)
    cf.set("inference_chunk_size", 64)
    chunked = detector.detect(scene.image)
    assert whole.n_survivors_per_stage == chunked.n_survivors_per_stage
    np.testing.assert_array_equal(whole.raw_boxes, chunked.raw_boxes)
    np.testing.assert_allclose(
        whole.raw_confidences, chunked.raw_confidences, atol=1e-6
    )


def test_pipelined_batches_consistent(detector):
    """Multi-chunk pipelined dispatch returns per-frame results identical to
    one-by-one detection (bounded in-flight queue must not reorder/mix)."""
    scenes = [
        synthetic.make_scene(64, 80, n_faces=1, seed=s, min_face=30, max_face=48).image
        for s in range(5)
    ]
    cf.set("inference_batch_frames", 2)
    cf.set("inference_pipeline_depth", 2)
    batched = detector.detect_batch(scenes)
    singles = [detector.detect(img) for img in scenes]
    for b, s in zip(batched, singles):
        assert b.n_survivors_per_stage == s.n_survivors_per_stage
        np.testing.assert_array_equal(b.raw_boxes, s.raw_boxes)


def test_plan_cache_tracks_config(detector):
    """Changing pyramid geometry between detects must rebuild the plan —
    the regression the (h, w)-keyed lru_cache had."""
    scene = synthetic.make_scene(64, 80, n_faces=0, seed=1)
    cf.set("window_scale_factor", 1.5)
    sparse = detector.detect(scene.image)
    cf.set("window_scale_factor", 1.1)
    dense = detector.detect(scene.image)
    assert dense.n_windows > sparse.n_windows
    cf.set("min_window_length", 0.5)
    shallow = detector.detect(scene.image)
    assert shallow.n_windows < dense.n_windows
