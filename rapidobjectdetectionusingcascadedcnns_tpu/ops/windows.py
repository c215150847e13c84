"""On-device pyramid resize + dense window extraction + window re-gather.

This module replaces the reference's hottest host loops with single jitted
XLA programs:

  * ``Window.extract_windows`` (data/rectangles.py:309-435): per-window Python
    slicing over a lazily resized pyramid  ->  :func:`extract_windows`, one
    fused resize+gather program per (image-size, window-size) bucket.
  * ``InferenceCascadeApp._get_increased_raw_window_for_next_net``
    (app/inference_cascade_app.py:346-401): per-window ``cv2.resize`` on the
    host  ->  :func:`crop_and_resize`, a batched bilinear gather that
    re-extracts all surviving windows at the next cascade resolution in one
    program, directly from the original image kept in HBM.

All shapes are static: the pyramid schedule is a hashable
:class:`..ops.pyramid.PyramidPlan` passed as a jit-static argument, and the
survivor set of the cascade uses fixed-capacity buffers (see models/cascade).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .pyramid import PyramidPlan


def resize_image(image: jnp.ndarray, out_h: int, out_w: int, *, antialias: bool = True) -> jnp.ndarray:
    """Bilinear image resize (H, W, C) -> (out_h, out_w, C) in float32.

    Stands in for scipy.misc.imresize / PIL bilinear (reference
    data/image_info.py:240); exact filter taps differ across libraries, so
    parity is within float tolerance by design.
    """
    image = image.astype(jnp.float32)
    if image.shape[0] == out_h and image.shape[1] == out_w:
        return image
    return jax.image.resize(
        image, (out_h, out_w, image.shape[2]), method="bilinear", antialias=antialias
    )


def _quantize_u8(x: jnp.ndarray) -> jnp.ndarray:
    """Round to the uint8 lattice but stay in float32 (the reference pipeline
    materializes uint8 pixels before standardization, data/image_info.py:236)."""
    return jnp.clip(jnp.round(x), 0.0, 255.0)


def _windows_one_scale(
    img_scaled: jnp.ndarray,
    xs: np.ndarray,
    ys: np.ndarray,
    window_h: int,
    window_w: int,
) -> jnp.ndarray:
    """Gather the full window grid from one pyramid level.

    Returns (nx * ny, window_h, window_w, C) in plan ordering (x-major).
    Implemented as two axis gathers (rows then columns) so XLA lowers it to
    efficient strided HBM reads instead of a per-window gather.
    """
    ny = len(ys)
    nx = len(xs)
    c = img_scaled.shape[-1]
    ys_idx = jnp.asarray(ys, dtype=jnp.int32)[:, None] + jnp.arange(
        window_h, dtype=jnp.int32
    )
    rows = img_scaled[ys_idx]  # (ny, wh, sw, C)
    xs_idx = jnp.asarray(xs, dtype=jnp.int32)[:, None] + jnp.arange(
        window_w, dtype=jnp.int32
    )
    wins = rows[:, :, xs_idx]  # (ny, wh, nx, ww, C)
    wins = jnp.transpose(wins, (2, 0, 1, 3, 4))  # (nx, ny, wh, ww, C)
    return wins.reshape(nx * ny, window_h, window_w, c)


@functools.partial(jax.jit, static_argnames=("plan", "quantize", "antialias"))
def extract_windows(
    image: jnp.ndarray,
    plan: PyramidPlan,
    *,
    quantize: bool = True,
    antialias: bool = True,
) -> jnp.ndarray:
    """Extract every sliding window of the pyramid schedule from ``image``.

    ``image``: (img_h, img_w, C) uint8/float. Returns
    (plan.n_windows, window_h, window_w, C) float32, in plan ordering
    (scale-major, then x, then y — identical to the reference's extraction
    order, data/rectangles.py:363-409).
    """
    if image.shape[0] != plan.img_h or image.shape[1] != plan.img_w:
        raise ValueError(
            "image shape {} does not match plan ({}, {})".format(
                image.shape, plan.img_h, plan.img_w
            )
        )
    image = image.astype(jnp.float32)
    parts = []
    for s in plan.scales:
        scaled = resize_image(image, s.scaled_h, s.scaled_w, antialias=antialias)
        if quantize and s.scale != 1.0:
            scaled = _quantize_u8(scaled)
        parts.append(
            _windows_one_scale(
                scaled, np.asarray(s.xs), np.asarray(s.ys), plan.window_h, plan.window_w
            )
        )
    return jnp.concatenate(parts, axis=0)


def _crop_and_resize_core(
    image: jnp.ndarray,
    boxes: jnp.ndarray,
    out_h: int,
    out_w: int,
    quantize: bool,
    high_precision: bool,
) -> jnp.ndarray:
    """Traceable core of :func:`crop_and_resize`.

    ``image``: (H, W, C); ``boxes``: (N, 4) in original pixel coordinates
    (xmin, ymin, xmax, ymax) with *exclusive* max (numpy-slice semantics, like
    the reference's ``Window.raw_norm`` crop, data/rectangles.py:293-307).
    Returns (N, out_h, out_w, C) float32.

    Sampling uses the half-pixel convention of ``cv2.resize`` applied to the
    cropped patch (app/inference_cascade_app.py:371-373), with coordinates
    clamped to the patch interior (replicate border).

    TPU-first implementation: bilinear interpolation is expressed as two
    per-box *interpolation matrices* (each output row/column has at most two
    non-zero taps), applied as einsum contractions. XLA lowers these to MXU
    matmuls; the naive formulation (four ``take_along_axis`` gathers) lowers
    to per-element gathers, which measured ~50-100x slower on TPU v5e.
    """
    image = image.astype(jnp.float32)
    boxes = boxes.astype(jnp.float32)
    xmin, ymin, xmax, ymax = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    box_w = xmax - xmin
    box_h = ymax - ymin
    h, w = image.shape[0], image.shape[1]

    # output pixel o samples input coordinate (o + 0.5) * (in/out) - 0.5
    oy = (jnp.arange(out_h, dtype=jnp.float32) + 0.5)[None, :]  # (1, out_h)
    ox = (jnp.arange(out_w, dtype=jnp.float32) + 0.5)[None, :]
    local_y = oy * (box_h[:, None] / out_h) - 0.5  # (N, out_h)
    local_x = ox * (box_w[:, None] / out_w) - 0.5
    # clamp inside the crop (replicate border), then shift to image coords
    local_y = jnp.clip(local_y, 0.0, jnp.maximum(box_h[:, None] - 1.0, 0.0))
    local_x = jnp.clip(local_x, 0.0, jnp.maximum(box_w[:, None] - 1.0, 0.0))
    sy = jnp.clip(local_y + ymin[:, None], 0.0, h - 1.0)  # (N, out_h)
    sx = jnp.clip(local_x + xmin[:, None], 0.0, w - 1.0)  # (N, out_w)

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    y1 = jnp.minimum(y0 + 1.0, h - 1.0)
    x1 = jnp.minimum(x0 + 1.0, w - 1.0)
    wy = sy - y0
    wx = sx - x0

    hi = jnp.arange(h, dtype=jnp.float32)
    wi = jnp.arange(w, dtype=jnp.float32)
    # (N, out_h, H) / (N, out_w, W) two-tap interpolation matrices
    ry = (hi[None, None, :] == y0[:, :, None]) * (1.0 - wy[:, :, None]) + (
        hi[None, None, :] == y1[:, :, None]
    ) * wy[:, :, None]
    rx = (wi[None, None, :] == x0[:, :, None]) * (1.0 - wx[:, :, None]) + (
        wi[None, None, :] == x1[:, :, None]
    ) * wx[:, :, None]

    # Precision: uint8 pixel values are exactly representable in bfloat16, so
    # the only bf16 error is ~0.4% rounding of the interpolation taps (<= ~1
    # gray level, wiped out by the uint8 quantization below). bf16 runs the
    # MXU at full rate; HIGHEST costs ~6x and is offered for strict-parity
    # evaluation runs.
    if high_precision:
        hp = jax.lax.Precision.HIGHEST
        rows = jnp.einsum("nyh,hwc->nywc", ry, image, precision=hp)
        out = jnp.einsum("nywc,nxw->nyxc", rows, rx, precision=hp)
    else:
        rows = jnp.einsum(
            "nyh,hwc->nywc",
            ry.astype(jnp.bfloat16),
            image.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        out = jnp.einsum(
            "nywc,nxw->nyxc",
            rows.astype(jnp.bfloat16),
            rx.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    if quantize:
        out = _quantize_u8(out)
    return out


@functools.partial(
    jax.jit, static_argnames=("out_h", "out_w", "quantize", "high_precision")
)
def crop_and_resize(
    image: jnp.ndarray,
    boxes: jnp.ndarray,
    *,
    out_h: int,
    out_w: int,
    quantize: bool = True,
    high_precision: bool = False,
) -> jnp.ndarray:
    """Batched crop + bilinear resize straight from the full-resolution image.

    ``image``: (H, W, C); ``boxes``: (N, 4) in original pixel coordinates
    (xmin, ymin, xmax, ymax) with *exclusive* max (numpy-slice semantics, like
    the reference's ``Window.raw_norm`` crop, data/rectangles.py:293-307).
    Returns (N, out_h, out_w, C) float32. See :func:`_crop_and_resize_core`.
    """
    return _crop_and_resize_core(image, boxes, out_h, out_w, quantize, high_precision)


def crop_and_resize_impl(
    image: jnp.ndarray,
    boxes: jnp.ndarray,
    out_h: int,
    out_w: int,
    quantize: bool,
    high_precision: bool,
    resample_impl: str,
) -> jnp.ndarray:
    """Traceable dispatch between the XLA interpolation-matrix formulation
    and the fused Pallas kernel (ops/windows_pallas.py). ``resample_impl`` is
    threaded as a *static* argument from the host orchestration (never read
    from config inside a trace — a config flip must not be baked into a
    cached executable)."""
    if resample_impl in ("pallas", "pallas2") and not high_precision:
        # "pallas2" only changes the cascade's STATIC stage-0 extraction
        # (ops/windows_sched.py); for dynamic box sets it means the v1 kernel
        from .windows_pallas import crop_and_resize_pallas

        return crop_and_resize_pallas(
            image, boxes, out_h=out_h, out_w=out_w, quantize=quantize
        )
    return _crop_and_resize_core(image, boxes, out_h, out_w, quantize, high_precision)


def crop_windows_chunked(
    image: jnp.ndarray,
    boxes: jnp.ndarray,
    out_h: int,
    out_w: int,
    chunk: int = 16384,
    quantize: bool = True,
    high_precision: bool = False,
) -> jnp.ndarray:
    """Memory-bounded crop_and_resize over very large window sets (traceable).

    Dense pyramids (FDDB uses window_scale_factor 1.005 =>
    ~500 scales / ~1e5+ windows, app/evaluate_fddb_app.py:34) make both the
    per-scale unrolled extraction graph (compile time) and a single
    interpolation-matrix einsum (VMEM/HBM) infeasible. This pads the window
    set to a chunk multiple and lax.maps the einsum kernel over chunks: the
    program stays a handful of ops regardless of pyramid density.

    Boxes may be float (fractional window geometry): extracting a window at
    pyramid scale s equals crop_and_resize of the float box
    ``coords / s`` — the half-pixel sampling positions coincide exactly with
    resize-then-slice (see ops/pyramid.py ordering contract).
    """
    n = boxes.shape[0]
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    boxes_p = jnp.concatenate([boxes, jnp.broadcast_to(boxes[-1:], (pad, 4))])
    boxes_c = boxes_p.reshape(n_chunks, chunk, 4)

    def one(chunk_boxes):
        return _crop_and_resize_core(
            image, chunk_boxes, out_h, out_w, quantize, high_precision
        )

    out = jax.lax.map(one, boxes_c)
    return out.reshape(n_chunks * chunk, out_h, out_w, image.shape[-1])[:n]


def extract_windows_crop(
    image: jnp.ndarray,
    boxes_float: jnp.ndarray,
    window_h: int,
    window_w: int,
    chunk: int = 16384,
    high_precision: bool = False,
) -> jnp.ndarray:
    """Dense-pyramid window extraction as one chunked crop_and_resize
    (traceable). ``boxes_float``: (N, 4) float window boxes on the original
    image (scaled-plan coords divided by their scale)."""
    return crop_windows_chunked(
        image.astype(jnp.float32),
        boxes_float.astype(jnp.float32),
        window_h,
        window_w,
        chunk=chunk,
        quantize=True,
        high_precision=high_precision,
    )


def count_compiles_hint(plan: PyramidPlan) -> int:
    """Diagnostic: number of XLA ops-heavy levels in the plan (one resize +
    one double-gather each)."""
    return plan.n_scales
