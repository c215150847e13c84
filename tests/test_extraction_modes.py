"""Gather-mode vs crop-mode window extraction equivalence."""

import jax.numpy as jnp
import numpy as np
import pytest

from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
from rapidobjectdetectionusingcascadedcnns_tpu.data import synthetic
from rapidobjectdetectionusingcascadedcnns_tpu.models import cascade
from rapidobjectdetectionusingcascadedcnns_tpu.ops import pyramid, windows


def test_crop_mode_matches_gather_mode_pixels(rng):
    """The chunked crop extraction samples the same positions as
    resize-then-slice; values agree within interpolation tolerance (gather
    mode antialiases its per-level resizes, crop mode samples two taps)."""
    img = rng.randint(0, 256, size=(100, 120, 3)).astype(np.uint8)
    plan = pyramid.build_plan(100, 120, 24, 24, 0.075, 1.5)
    table = pyramid.window_table(plan)

    by_gather = np.asarray(windows.extract_windows(jnp.asarray(img), plan, antialias=False))
    by_crop = np.asarray(
        windows.extract_windows_crop(
            jnp.asarray(img),
            jnp.asarray(table["boxes_float"]),
            24,
            24,
            chunk=64,
            high_precision=True,
        )
    )
    assert by_crop.shape == by_gather.shape
    # scale-1.0 windows are plain slices in both modes: must be exact
    n_scale0 = plan.scales[0].n_windows
    np.testing.assert_array_equal(by_crop[:n_scale0], by_gather[:n_scale0])
    # resized levels: same sampling grid, same bilinear taps
    np.testing.assert_allclose(by_crop, by_gather, atol=1.0)


def test_chunk_padding_roundtrip(rng):
    img = jnp.asarray(rng.randint(0, 256, size=(60, 60, 3)).astype(np.float32))
    boxes = jnp.asarray(
        np.array([[0, 0, 30, 30], [10, 10, 50, 50], [5, 0, 25, 20]], np.float32)
    )
    # chunk=2 forces padding (3 -> 4)
    out = np.asarray(windows.crop_windows_chunked(img, boxes, 12, 12, chunk=2))
    ref = np.asarray(
        windows.crop_and_resize(img, boxes, out_h=12, out_w=12)
    )
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_resolve_extraction_mode():
    coarse = pyramid.build_plan(100, 100, 24, 24, 0.075, 1.5)
    dense = pyramid.build_plan(200, 200, 12, 12, 0.075, 1.01)
    cf.set("window_extraction_mode", "auto")
    assert cascade.resolve_extraction_mode(coarse) == "gather"
    assert cascade.resolve_extraction_mode(dense) == "crop"
    cf.set("window_extraction_mode", "crop")
    assert cascade.resolve_extraction_mode(coarse) == "crop"


def test_cascade_detections_agree_across_modes():
    """End-to-end: the same model + scene produce (nearly) identical raw
    survivors in both extraction modes."""
    cf.set("conv_filter_sizes", [8])
    cf.set("fc1_size", 32)
    cf.set("compute_dtype", "float32")
    cf.set("nms", cf.NMS_DISABLED)
    cf.set("foreground_confidence_threshold", 0.5)
    model = cascade.build_cascade_model(seed=0)
    scene = synthetic.make_scene(100, 100, n_faces=1, seed=3, min_face=40, max_face=60)

    cf.set("window_extraction_mode", "gather")
    det = cascade.CascadeDetector(model)
    res_gather = det.detect(scene.image)

    cf.set("window_extraction_mode", "crop")
    res_crop = cascade.CascadeDetector(model).detect(scene.image)

    assert res_gather.n_windows == res_crop.n_windows
    set_g = set(map(tuple, res_gather.raw_boxes.tolist()))
    set_c = set(map(tuple, res_crop.raw_boxes.tolist()))
    # a RANDOM model puts most windows right at the p=0.5 decision boundary,
    # so the modes' interpolation differences (gather antialiases its level
    # resizes, crop samples two taps) flip an outsized share of windows; a
    # trained model's margins make the modes agree much more closely
    inter = len(set_g & set_c)
    union = max(len(set_g | set_c), 1)
    assert inter / union > 0.8, (len(set_g), len(set_c), inter)
