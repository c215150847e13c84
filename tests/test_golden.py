"""Golden-output regression: detections for a fixed (model seed, scene seed)
pair are recorded in tests/goldens/ and must stay stable across refactors.

This is the project-side analog of BASELINE.json's "detections match within
float tolerance" requirement: it pins the full pipeline (pyramid schedule ->
extraction -> cascade -> NMS) against drift. Regenerate intentionally with
RODC_REGEN_GOLDENS=1 when a change is MEANT to alter detections, and explain
the change in the commit.
"""

import os

import numpy as np
import pytest

from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
from rapidobjectdetectionusingcascadedcnns_tpu.data import synthetic
from rapidobjectdetectionusingcascadedcnns_tpu.models import cascade

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _configure():
    cf.set("conv_filter_sizes", [8])
    cf.set("fc1_size", 32)
    cf.set("compute_dtype", "float32")
    cf.set("nms", cf.NMS_OPENCV)
    cf.set("nms_opencv_min_neighbors", 0)
    cf.set("foreground_confidence_threshold", 0.5)


def _detect(seed):
    model = cascade.build_cascade_model(seed=0)
    det = cascade.CascadeDetector(model)
    scene = synthetic.make_scene(100, 120, 1, seed=seed, min_face=40, max_face=60)
    return det.detect(scene.image)


@pytest.mark.parametrize("scene_seed", [3, 7])
def test_detections_match_golden(scene_seed):
    _configure()
    res = _detect(scene_seed)
    path = os.path.join(GOLDEN_DIR, "detect_s{}.npz".format(scene_seed))

    if os.environ.get("RODC_REGEN_GOLDENS") == "1" or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez(
            path,
            boxes=res.boxes,
            confidences=res.confidences,
            raw_boxes=res.raw_boxes,
            n_windows=res.n_windows,
        )
        pytest.skip("golden (re)generated: {}".format(path))

    with np.load(path) as g:
        assert res.n_windows == int(g["n_windows"])  # pyramid schedule stable
        golden_raw = set(map(tuple, g["raw_boxes"].tolist()))
        ours_raw = set(map(tuple, res.raw_boxes.tolist()))
        # raw survivors: small drift allowed for interpolation changes, bulk
        # must match exactly
        inter = len(golden_raw & ours_raw)
        union = max(len(golden_raw | ours_raw), 1)
        assert inter / union > 0.95, (len(golden_raw), len(ours_raw), inter)
        # NMS'd boxes within a couple of pixels of the recorded ones
        assert len(res.boxes) == len(g["boxes"])
        golden_sorted = np.asarray(sorted(map(tuple, g["boxes"].tolist())))
        ours_sorted = np.asarray(sorted(map(tuple, res.boxes.tolist())))
        np.testing.assert_allclose(ours_sorted, golden_sorted, atol=2.0)
