"""Fused Pallas window-resampling kernel: parity vs the XLA formulation.

On CPU the kernel runs in interpret mode; numerics (bf16 taps/pixels, f32
accumulation, u8 quantization) match the default-precision XLA path
bit-for-bit up to MXU accumulation order, which the u8 quantization absorbs.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rapidobjectdetectionusingcascadedcnns_tpu.ops import windows, windows_pallas


def _random_boxes(rng, n, img_h, img_w, min_side=4, max_side=None):
    max_side = max_side or min(img_h, img_w)
    x0 = rng.uniform(0, img_w - min_side, n)
    y0 = rng.uniform(0, img_h - min_side, n)
    w = rng.uniform(min_side, max_side, n)
    h = rng.uniform(min_side, max_side, n)
    return np.stack([x0, y0, np.minimum(x0 + w, img_w), np.minimum(y0 + h, img_h)], axis=1).astype(np.float32)


@pytest.mark.parametrize("out", [12, 24, 48])
def test_matches_xla_formulation(rng, out):
    img = rng.randint(0, 256, size=(100, 120, 3)).astype(np.float32)
    boxes = _random_boxes(rng, 37, 100, 120)
    ref = np.asarray(
        windows.crop_and_resize(jnp.asarray(img), jnp.asarray(boxes), out_h=out, out_w=out)
    )
    got = np.asarray(
        windows_pallas.crop_and_resize_pallas(
            jnp.asarray(img), jnp.asarray(boxes), out_h=out, out_w=out, interpret=True
        )
    )
    # quantized u8 outputs: disagreement only possible at exact .5 rounding
    # boundaries of the f32 accumulation; none occur on this fixture
    np.testing.assert_array_equal(got, ref)


def test_degenerate_and_edge_boxes(rng):
    """Replicate-border clamps: zero-area, off-grid and full-image boxes."""
    img = rng.randint(0, 256, size=(50, 60, 3)).astype(np.float32)
    boxes = np.array(
        [
            [0, 0, 60, 50],  # full image
            [59, 49, 60, 50],  # 1x1 corner
            [10.5, 20.25, 10.6, 20.5],  # sub-pixel box
            [0, 0, 1, 1],
            [55, 45, 60, 50],
        ],
        np.float32,
    )
    ref = np.asarray(windows.crop_and_resize(jnp.asarray(img), jnp.asarray(boxes), out_h=12, out_w=12))
    got = np.asarray(
        windows_pallas.crop_and_resize_pallas(
            jnp.asarray(img), jnp.asarray(boxes), out_h=12, out_w=12, interpret=True
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_unquantized_close(rng):
    img = rng.randint(0, 256, size=(40, 40, 3)).astype(np.float32)
    boxes = _random_boxes(rng, 9, 40, 40)
    ref = np.asarray(
        windows.crop_and_resize(
            jnp.asarray(img), jnp.asarray(boxes), out_h=24, out_w=24, quantize=False
        )
    )
    got = np.asarray(
        windows_pallas.crop_and_resize_pallas(
            jnp.asarray(img), jnp.asarray(boxes), out_h=24, out_w=24,
            quantize=False, interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, atol=1.0)  # bf16 accumulation-order


def test_tile_padding_roundtrip(rng):
    """N not a multiple of the window tile exercises the pad/drop path."""
    img = rng.randint(0, 256, size=(30, 30, 3)).astype(np.float32)
    for n in (1, 5, 33):
        boxes = _random_boxes(rng, n, 30, 30)
        got = np.asarray(
            windows_pallas.crop_and_resize_pallas(
                jnp.asarray(img), jnp.asarray(boxes), out_h=12, out_w=12, interpret=True
            )
        )
        assert got.shape == (n, 12, 12, 3)
        ref = np.asarray(
            windows.crop_and_resize(jnp.asarray(img), jnp.asarray(boxes), out_h=12, out_w=12)
        )
        np.testing.assert_array_equal(got, ref)


def test_tile_window_alignment():
    for oh, ow in ((12, 12), (24, 24), (48, 48), (299, 299)):
        t = windows_pallas._tile_windows(oh, ow)
        assert (t * ow) % 128 == 0
        assert (t * oh) % 8 == 0


def test_dispatch_selects_impl(rng):
    """crop_and_resize_impl('xla') equals the core; 'pallas' falls back to
    XLA for the high-precision path."""
    img = jnp.asarray(rng.randint(0, 256, size=(30, 30, 3)).astype(np.float32))
    boxes = jnp.asarray(_random_boxes(rng, 4, 30, 30))
    a = np.asarray(windows.crop_and_resize_impl(img, boxes, 12, 12, True, False, "xla"))
    b = np.asarray(windows.crop_and_resize(img, boxes, out_h=12, out_w=12))
    np.testing.assert_array_equal(a, b)
    hp = np.asarray(windows.crop_and_resize_impl(img, boxes, 12, 12, True, True, "pallas"))
    hp_ref = np.asarray(
        windows.crop_and_resize(img, boxes, out_h=12, out_w=12, high_precision=True)
    )
    np.testing.assert_array_equal(hp, hp_ref)
