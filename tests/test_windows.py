"""On-device window extraction vs numpy slicing oracle, and crop_and_resize
vs cv2.resize (the reference's per-window host resize,
app/inference_cascade_app.py:371-373)."""

import numpy as np
import pytest

from rapidobjectdetectionusingcascadedcnns_tpu.ops import pyramid, windows


def _np_resize_bilinear(img, out_h, out_w):
    """Reference-free check helper: use jax's own resize on host for the
    pyramid levels so the oracle only checks the *gather* logic exactly."""
    import jax

    return np.asarray(
        jax.image.resize(
            img.astype(np.float32), (out_h, out_w, img.shape[2]), "bilinear"
        )
    )


def test_extract_windows_matches_numpy_slicing(rng):
    img = rng.randint(0, 256, size=(100, 120, 3)).astype(np.uint8)
    plan = pyramid.build_plan(100, 120, 24, 24, 0.075, 1.5)
    assert plan.n_windows > 0

    out = np.asarray(windows.extract_windows(img, plan))
    assert out.shape == (plan.n_windows, 24, 24, 3)

    table = pyramid.window_table(plan)
    offset = 0
    for s in plan.scales:
        scaled = _np_resize_bilinear(img, s.scaled_h, s.scaled_w)
        if s.scale != 1.0:
            scaled = np.clip(np.round(scaled), 0, 255)
        for i in range(s.n_windows):
            x0, y0, x1, y1 = table["coords"][offset + i]
            np.testing.assert_allclose(
                out[offset + i], scaled[y0:y1, x0:x1], rtol=1e-5, atol=1e-3
            )
        offset += s.n_windows


def test_extract_windows_scale_one_is_exact(rng):
    """At scale 1.0 (no resize) the gather must be bit-exact."""
    img = rng.randint(0, 256, size=(64, 64, 3)).astype(np.uint8)
    plan = pyramid.build_plan(64, 64, 48, 48, 0.075, 1.1)
    s0 = plan.scales[0]
    assert s0.scale == 1.0
    out = np.asarray(windows.extract_windows(img, plan))
    table = pyramid.window_table(plan)
    for i in range(s0.n_windows):
        x0, y0, x1, y1 = table["coords"][i]
        np.testing.assert_array_equal(out[i], img[y0:y1, x0:x1].astype(np.float32))


def test_crop_and_resize_identity(rng):
    """Cropping an exact region at its own size is a no-op."""
    img = rng.randint(0, 256, size=(50, 60, 3)).astype(np.uint8)
    boxes = np.array([[10, 5, 34, 29]], dtype=np.float32)  # 24x24
    out = np.asarray(windows.crop_and_resize(img, boxes, out_h=24, out_w=24))
    np.testing.assert_array_equal(out[0], img[5:29, 10:34].astype(np.float32))


def test_crop_and_resize_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    img = rng.randint(0, 256, size=(80, 90, 3)).astype(np.uint8)
    cases = [(4, 6, 16, 18), (0, 0, 45, 40), (30, 20, 90, 80)]
    boxes = np.array(cases, dtype=np.float32)
    # strict-parity mode: exact float32 interpolation taps
    out = np.asarray(
        windows.crop_and_resize(
            img, boxes, out_h=24, out_w=24, quantize=False, high_precision=True
        )
    )
    # fast mode (bf16 taps): within ~1 gray level of the exact result
    out_fast = np.asarray(
        windows.crop_and_resize(img, boxes, out_h=24, out_w=24, quantize=False)
    )
    for k, (x0, y0, x1, y1) in enumerate(cases):
        patch = img[y0:y1, x0:x1]
        expected = cv2.resize(
            patch.astype(np.float32), (24, 24), interpolation=cv2.INTER_LINEAR
        )
        np.testing.assert_allclose(out[k], expected, rtol=1e-4, atol=0.51)
        np.testing.assert_allclose(out_fast[k], expected, atol=1.6)


def test_crop_and_resize_batch_shapes(rng):
    img = rng.randint(0, 256, size=(80, 90, 3)).astype(np.uint8)
    boxes = rng.randint(0, 30, size=(17, 2))
    sizes = rng.randint(10, 40, size=(17, 2))
    boxes = np.concatenate([boxes, boxes + sizes], axis=1).astype(np.float32)
    out = windows.crop_and_resize(img, boxes, out_h=48, out_w=48)
    assert out.shape == (17, 48, 48, 3)
    assert np.isfinite(np.asarray(out)).all()
