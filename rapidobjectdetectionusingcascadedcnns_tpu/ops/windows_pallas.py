"""Pallas TPU kernel: fused batched crop + bilinear resize (window resampling).

Replaces the XLA interpolation-matrix formulation of
:func:`.windows._crop_and_resize_core` on the inference hot path
(the re-implementation of the reference's per-window host ``cv2.resize``,
/root/reference/app/inference_cascade_app.py:346-401).

Why the XLA version is slow at pyramid density (profiled on v5e,
tools/profile_device.py): the first einsum ``nyh,hwc->nywc`` materializes an
(N, out_h, W, C) float32 intermediate to HBM — 8.5 GB for FDDB's 131,903
windows on a 450x450 image — and the second einsum ``nywc,nxw->nyxc`` is a
batched tiny GEMM (M = out_h*C of 36..144) at ~3% MXU utilization. Measured:
98 ms for stage-0 extraction, 90/81 ms for the stage-1/2 re-extracts.

This kernel keeps everything on-chip:
  * the source image lives in VMEM (channel-planar (C*H, W) bf16; a 450x450x3
    frame is 1.2 MB, VGA is 1.8 MB — far under the ~16 MB budget);
  * per window-tile, the two-tap interpolation matrices are built on the VPU
    directly from the sampling positions via the triangle identity
    ``w(h) = relu(1 - |h - sy|)`` (exactly the bilinear taps, 4 VPU ops per
    element, no gathers);
  * both contractions run back-to-back on the MXU with the (tile*out_h, W)
    intermediate in a VMEM scratch — nothing but the final windows ever
    touches HBM.

Numerics match the XLA default path (bf16 taps/pixels, f32 accumulation,
uint8 re-quantization): the triangle weights equal the two-tap weights
exactly in f32, so only MXU accumulation order differs — wiped out by the
uint8 quantization except for exact .5 boundaries.

Layouts: sampling positions arrive pre-shaped ((N*out_h, 1) sublane-major for
rows, (1, N*out_w) lane-major for columns) so the kernel never transposes
between sublanes and lanes; the output leaves as (C*out_h, N*out_w) —
windows along lanes — and is transposed back to NHWC by XLA outside.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile_windows(out_h: int, out_w: int) -> int:
    """Windows per grid step. Mosaic requires block dims divisible by
    (8, 128) (or equal to the array dims), so the tile must make
    ``tile * out_w`` a lane multiple and ``tile * out_h`` a sublane multiple;
    scaled up to >= 256 lanes so stores and the second matmul fill the MXU."""
    import math

    t = 128 // math.gcd(out_w, 128)
    while t * out_w < 256:
        t *= 2
    while (t * out_h) % 8:
        t *= 2
    return t


def _resample_kernel(sy_ref, sx_ref, img_ref, out_ref, v_scratch, *,
                     tile: int, c: int, h: int, w: int, out_h: int,
                     out_w: int, quantize: bool, blockdiag: bool = False):
    # two-tap bilinear weights via the triangle identity (VPU, no gathers):
    # ry[r, hh] = relu(1 - |hh - sy_r|) has exactly the two nonzero taps
    # (1 - frac) at floor(sy) and frac at floor(sy)+1.
    h_iota = jax.lax.broadcasted_iota(jnp.int32, (tile * out_h, h), 1).astype(
        jnp.float32
    )
    ry = jnp.maximum(0.0, 1.0 - jnp.abs(h_iota - sy_ref[:, :])).astype(
        jnp.bfloat16
    )  # (tile*out_h, H)
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (w, tile * out_w), 0).astype(
        jnp.float32
    )
    rx = jnp.maximum(0.0, 1.0 - jnp.abs(w_iota - sx_ref[:, :])).astype(
        jnp.bfloat16
    )  # (W, tile*out_w)

    for ci in range(c):
        img_c = img_ref[ci * h : (ci + 1) * h, :]  # (H, W) bf16
        # vertical pass: one well-shaped MXU matmul for the whole tile
        v_scratch[:, :] = jnp.dot(
            ry, img_c, preferred_element_type=jnp.float32
        )  # (tile*out_h, W) f32
        if blockdiag:
            # ONE horizontal matmul for the whole tile: each window's result
            # is a diagonal block of the (tile*out_h, tile*out_w) product.
            # tile-1 off-diagonal blocks are wasted MXU FLOPs, but the MXU is
            # otherwise idle while `tile` serial (out_h, W)x(W, out_w)
            # matmuls pay per-issue overhead (measured: the serial loop is
            # the kernel's top cost at FDDB density, tools/profile_reextract)
            p = jnp.dot(
                v_scratch[:, :].astype(jnp.bfloat16),
                rx,
                preferred_element_type=jnp.float32,
            )  # (tile*out_h, tile*out_w)
            for t in range(tile):
                o = p[t * out_h : (t + 1) * out_h, t * out_w : (t + 1) * out_w]
                if quantize:
                    o = jnp.clip(jnp.round(o), 0.0, 255.0)
                out_ref[
                    ci * out_h : (ci + 1) * out_h, t * out_w : (t + 1) * out_w
                ] = o
        else:
            for t in range(tile):
                v_t = v_scratch[t * out_h : (t + 1) * out_h, :].astype(jnp.bfloat16)
                r_t = rx[:, t * out_w : (t + 1) * out_w]  # (W, out_w)
                o = jnp.dot(v_t, r_t, preferred_element_type=jnp.float32)
                if quantize:
                    o = jnp.clip(jnp.round(o), 0.0, 255.0)
                out_ref[
                    ci * out_h : (ci + 1) * out_h, t * out_w : (t + 1) * out_w
                ] = o


@functools.partial(
    jax.jit,
    static_argnames=("out_h", "out_w", "quantize", "interpret", "blockdiag"),
)
def crop_and_resize_pallas(
    image: jnp.ndarray,
    boxes: jnp.ndarray,
    *,
    out_h: int,
    out_w: int,
    quantize: bool = True,
    interpret: bool = None,
    blockdiag: bool = False,
) -> jnp.ndarray:
    """Drop-in fused replacement for :func:`.windows.crop_and_resize`
    (default-precision path). ``image``: (H, W, C); ``boxes``: (N, 4) float
    (xmin, ymin, xmax, ymax), exclusive max. Returns (N, out_h, out_w, C)
    float32. Sampling convention identical to ``_crop_and_resize_core``
    (cv2.resize half-pixel grid on the crop, replicate border)."""
    if interpret is None:
        # compiled Mosaic kernels exist only on TPU; everywhere else (e.g.
        # CPU test runs forcing use_pallas_resample="pallas") fall back to
        # the interpreter so the path stays exercisable
        interpret = not pallas_available()
    image = image.astype(jnp.float32)
    boxes = boxes.astype(jnp.float32)
    h, w, c = image.shape
    n = boxes.shape[0]
    xmin, ymin, xmax, ymax = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    box_w = xmax - xmin
    box_h = ymax - ymin

    # sampling positions (same arithmetic as _crop_and_resize_core)
    oy = (jnp.arange(out_h, dtype=jnp.float32) + 0.5)[None, :]
    ox = (jnp.arange(out_w, dtype=jnp.float32) + 0.5)[None, :]
    local_y = oy * (box_h[:, None] / out_h) - 0.5
    local_x = ox * (box_w[:, None] / out_w) - 0.5
    local_y = jnp.clip(local_y, 0.0, jnp.maximum(box_h[:, None] - 1.0, 0.0))
    local_x = jnp.clip(local_x, 0.0, jnp.maximum(box_w[:, None] - 1.0, 0.0))
    sy = jnp.clip(local_y + ymin[:, None], 0.0, h - 1.0)  # (N, out_h)
    sx = jnp.clip(local_x + xmin[:, None], 0.0, w - 1.0)  # (N, out_w)

    tile = _tile_windows(out_h, out_w)
    if tile * out_w > 4096:
        # degenerate output widths would need huge tiles to align lanes;
        # fall back to the XLA formulation
        from .windows import _crop_and_resize_core

        return _crop_and_resize_core(image, boxes, out_h, out_w, quantize, False)
    n_pad = ((n + tile - 1) // tile) * tile
    if n_pad != n:
        sy = jnp.concatenate([sy, jnp.zeros((n_pad - n, out_h), jnp.float32)])
        sx = jnp.concatenate([sx, jnp.zeros((n_pad - n, out_w), jnp.float32)])

    sy_flat = sy.reshape(n_pad * out_h, 1)
    sx_flat = sx.reshape(1, n_pad * out_w)
    img_planar = jnp.transpose(image, (2, 0, 1)).reshape(c * h, w).astype(
        jnp.bfloat16
    )

    grid = (n_pad // tile,)
    out = pl.pallas_call(
        functools.partial(
            _resample_kernel,
            tile=tile,
            c=c,
            h=h,
            w=w,
            out_h=out_h,
            out_w=out_w,
            quantize=quantize,
            blockdiag=blockdiag,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile * out_h, 1), lambda i: (i, 0)),
            pl.BlockSpec((1, tile * out_w), lambda i: (0, i)),
            pl.BlockSpec((c * h, w), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((c * out_h, tile * out_w), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((c * out_h, n_pad * out_w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile * out_h, w), jnp.float32)],
        interpret=interpret,
    )(sy_flat, sx_flat, img_planar)

    # (C*out_h, N*out_w) -> (N, out_h, out_w, C)
    out = out.reshape(c, out_h, n_pad, out_w)
    out = jnp.transpose(out, (2, 1, 3, 0))
    return out[:n]


def pallas_available() -> bool:
    """True when the default backend runs real Pallas TPU kernels."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend probing
        return False
