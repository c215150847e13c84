"""Support-bounded re-extraction for DYNAMIC survivor boxes (stage 1/2).

The scheduled stage-0 kernel (:mod:`.windows_sched`) exploits the *static*
pyramid geometry to bound each window's contraction to a small image cell.
Survivor boxes after a cascade compaction are runtime values, so the binning
must happen ON DEVICE (verdict r2 item 3 / NOTES round-3 roadmap item 1):

  * the image rides in a SHIFT LATTICE: V row-shifted copies (granularity
    G = R/V rows) stacked into one (V*h_pad, w_pad) plane per channel, so a
    window's support fits an aligned R-row cell of SOME copy whenever its
    height is <= R - G + 1 — alignment escalation (the static ladder's 50%+
    straddle problem) disappears without per-window dynamic slicing, which
    Mosaic only allows at sublane granularity;
  * each window's lattice cell m = floor(support_start / G) is computed from
    the same jnp sampling positions the kernel uses (one-row guard band);
    windows are argsorted by m so tiles are cell-coherent, and the per-tile
    cell index rides a scalar-prefetch operand into the plane BlockSpec
    index_map — computed BY THE TRACED PROGRAM, not the host;
  * windows taller than the rung, or windows sharing a tile with a
    different cell (group boundaries), fall back to a fixed-capacity BIG
    class extracted by the v1 full-image kernel; a big-class overflow COUNT
    is returned so the cascade's saturation re-dispatch machinery can re-run
    the image with the always-correct v1 path (never silent truncation).

Numerics: in-cell taps equal global taps exactly (cell-local coordinates
differ by an exact integer) and out-of-cell rows carry exactly-zero weights,
so results are bit-identical to the v1 kernel / XLA path modulo the shared
u8 quantization, same as the static scheduler.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .windows_pallas import _tile_windows, pallas_available
from .windows_sched import _sample_positions_jnp


ROW_RUNG = 128  # R: cell rows (sublane-aligned, divides h_pad)
SHIFT_G = 32  # G: lattice granularity; V = R/G shifted copies
N_VARIANTS = ROW_RUNG // SHIFT_G


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def dyn_supported(img_h: int, img_w: int, out_h: int, out_w: int, n: int) -> bool:
    """Geometry gate: the lattice pays only when the row rung actually cuts
    the contraction (small images fit one cell anyway) and the tile shape is
    lane-alignable (same limit as the v1 kernel)."""
    tile = _tile_windows(out_h, out_w)
    return (
        img_h >= 2 * ROW_RUNG
        and img_w >= 128
        and tile * out_w <= 4096
        and n >= 4 * tile
    )


def default_big_cap(cap: int, out_h: int, out_w: int, img_h: int) -> int:
    """Static big-class capacity: a tall-window share (cap//4 — window-size
    distributions put 75-90% of pyramid windows under the 128-row rung) plus
    the exact worst case of group-boundary demotions (#lattice cells x
    (tile-1) — every cell boundary can strand at most tile-1 windows in a
    mixed tile); tile-aligned, clamped to cap."""
    tile = _tile_windows(out_h, out_w)
    n_cells = _ceil_to(img_h, ROW_RUNG) // SHIFT_G
    demotion_bound = n_cells * (tile - 1)
    return min(
        _ceil_to(cap, tile),
        _ceil_to(max(2 * tile, cap // 4 + demotion_bound), tile),
    )


def _dyn_kernel(offs_ref, sy_ref, sx_ref, *refs, tile: int, c: int,
                w_pad: int, out_h: int, out_w: int, quantize: bool):
    """Row-bounded resample: contraction rows limited to the tile's R-row
    lattice cell (block-diagonal horizontal pass, see windows_pallas)."""
    plane_refs = refs[:c]
    out_ref = refs[c]
    v_scratch = refs[c + 1]

    r_iota = jax.lax.broadcasted_iota(
        jnp.int32, (tile * out_h, ROW_RUNG), 1
    ).astype(jnp.float32)
    ry = jnp.maximum(0.0, 1.0 - jnp.abs(r_iota - sy_ref[:, :])).astype(
        jnp.bfloat16
    )  # (tile*out_h, R)
    c_iota = jax.lax.broadcasted_iota(
        jnp.int32, (w_pad, tile * out_w), 0
    ).astype(jnp.float32)
    rx = jnp.maximum(0.0, 1.0 - jnp.abs(c_iota - sx_ref[:, :])).astype(
        jnp.bfloat16
    )  # (w_pad, tile*out_w)

    for ci in range(c):
        v_scratch[:, :] = jnp.dot(
            ry, plane_refs[ci][:, :], preferred_element_type=jnp.float32
        )  # (tile*out_h, w_pad)
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
            ] = o.astype(out_ref.dtype)


def _build_lattice_planes(image_f: jnp.ndarray, h_pad: int, w_pad: int):
    """(V*h_pad, w_pad) bf16 per channel: variant v holds the image shifted
    UP by v*G rows (so lattice cell j of variant v covers original rows
    [j*R + v*G, j*R + v*G + R))."""
    h, w, c = image_f.shape
    img = jnp.pad(
        image_f,
        ((0, h_pad + (N_VARIANTS - 1) * SHIFT_G - h), (0, w_pad - w), (0, 0)),
    )
    variants = [
        img[v * SHIFT_G : v * SHIFT_G + h_pad] for v in range(N_VARIANTS)
    ]
    stack = jnp.concatenate(variants, axis=0)  # (V*h_pad, w_pad, C)
    return [stack[:, :, ci].astype(jnp.bfloat16) for ci in range(c)]


def extract_rowbound(
    image_f: jnp.ndarray,  # (H, W, C) float32
    boxes: jnp.ndarray,  # (N, 4) float32 survivor boxes (runtime values)
    out_h: int,
    out_w: int,
    *,
    big_cap: int,
    quantize: bool = True,
    interpret: bool = None,
    out_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Extract all N windows with row-bounded contractions.

    Returns ``(windows (N, out_h, out_w, C) out_dtype in ORIGINAL box order,
    n_big (int32 scalar — windows that needed the big class), overflow
    (int32 scalar — big windows beyond ``big_cap``; >0 means that many
    windows carry garbage pixels and the caller must re-dispatch))``.
    bf16 ``out_dtype`` is exact for quantized u8 pixels (integers <= 255).
    """
    if interpret is None:
        interpret = not pallas_available()
    h, w, c = image_f.shape
    n = boxes.shape[0]
    tile = _tile_windows(out_h, out_w)
    assert big_cap % tile == 0
    h_pad = _ceil_to(h, ROW_RUNG)
    w_pad = _ceil_to(w, 128)
    n_pad = _ceil_to(n, tile)

    sy, sx = _sample_positions_jnp(boxes, h, w, out_h, out_w)  # (N, oh/ow)
    # support rows (positions are monotone along the output axis), one-row
    # guard band for trace-vs-trace ulp differences (windows_sched doctrine)
    rlo = jnp.clip(jnp.floor(sy[:, 0]) - 1, 0, h - 1)
    rhi = jnp.clip(jnp.floor(sy[:, -1]) + 2, 0, h - 1)
    m = (rlo // SHIFT_G).astype(jnp.int32)  # lattice cell index
    fits = (rhi - m.astype(jnp.float32) * SHIFT_G) < ROW_RUNG

    # cell-coherent ordering: small windows grouped by lattice cell, big last
    n_cells = N_VARIANTS * (h_pad // ROW_RUNG)
    key = jnp.where(fits, m, n_cells + 1)
    perm = jnp.argsort(key, stable=True)
    if n_pad != n:
        # pad with replicas of the last sorted window (valid geometry)
        perm = jnp.concatenate(
            [perm, jnp.broadcast_to(perm[-1:], (n_pad - n,))]
        )
    m_sorted = key[perm]  # big windows carry n_cells+1
    sy_s = sy[perm]
    sx_s = sx[perm]
    boxes_s = boxes[perm]

    n_tiles = n_pad // tile
    tile_m = m_sorted.reshape(n_tiles, tile)[:, 0]
    # a window is served by the small kernel iff it fits AND shares its
    # tile's cell; everything else goes to the big class
    tile_m_per_win = jnp.repeat(tile_m, tile)
    small_ok = (m_sorted <= n_cells) & (m_sorted == tile_m_per_win)
    big2 = ~small_ok
    # tile-padding replicas sit at the TAIL of the sorted array (appended
    # after argsort) — exclude them from the big count: they rank after
    # every real big window in the stable big-first order, so they never
    # displace a real window from the big class, and counting them would
    # report a spurious overflow whenever N isn't a tile multiple and the
    # last sorted window is big
    slot_real = jnp.arange(n_pad) < n
    n_big = jnp.sum((big2 & slot_real).astype(jnp.int32))
    overflow = jnp.maximum(n_big - big_cap, 0)

    # ---- small path: one pallas_call, per-tile lattice cell offsets ------
    # concatenated-lattice row-block index: cell m lives in variant m%V at
    # block m//V, i.e. concat block index (m%V) * (h_pad/R) + (m//V)
    blocks_per_variant = h_pad // ROW_RUNG
    tile_m_c = jnp.clip(tile_m, 0, n_cells - 1)
    tile_block = (tile_m_c % N_VARIANTS) * blocks_per_variant + (
        tile_m_c // N_VARIANTS
    )
    offs = jnp.stack(
        [tile_block.astype(jnp.int32), jnp.zeros((n_tiles,), jnp.int32)]
    )  # (2, tiles)

    cell_start = (tile_m_c * SHIFT_G).astype(jnp.float32)
    sy_local = (sy_s - jnp.repeat(cell_start, tile)[:, None]).reshape(-1, 1)
    sx_local = sx_s.reshape(1, -1)

    planes = _build_lattice_planes(image_f, h_pad, w_pad)
    plane_spec = pl.BlockSpec(
        (ROW_RUNG, w_pad), lambda i, offs: (offs[0, i], offs[1, i])
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile * out_h, 1), lambda i, offs: (i, 0)),
            pl.BlockSpec((1, tile * out_w), lambda i, offs: (0, i)),
        ]
        + [plane_spec] * c,
        out_specs=pl.BlockSpec(
            (c * out_h, tile * out_w), lambda i, offs: (0, i)
        ),
        scratch_shapes=[pltpu.VMEM((tile * out_h, w_pad), jnp.float32)],
    )
    small_out = pl.pallas_call(
        functools.partial(
            _dyn_kernel,
            tile=tile,
            c=c,
            w_pad=w_pad,
            out_h=out_h,
            out_w=out_w,
            quantize=quantize,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (c * out_h, n_pad * out_w), out_dtype
        ),
        interpret=interpret,
    )(offs, sy_local, sx_local, *planes)
    small_out = small_out.reshape(c, out_h, n_pad, out_w)
    small_out = jnp.transpose(small_out, (2, 1, 3, 0))  # (n_pad, oh, ow, C)

    # ---- big path: v1 full-image kernel over the big-class windows -------
    from .windows_pallas import crop_and_resize_pallas

    big_order = jnp.argsort(jnp.where(big2, 0, 1), stable=True)  # big first
    big_boxes = boxes_s[big_order[:big_cap]]
    big_out = crop_and_resize_pallas(
        image_f, big_boxes, out_h=out_h, out_w=out_w, quantize=quantize,
        interpret=interpret, blockdiag=True,
    ).astype(out_dtype)

    # ---- combine in sorted space, then un-permute to original order ------
    big_rank = jnp.cumsum(big2.astype(jnp.int32)) - 1  # rank among big
    big_src = jnp.clip(big_rank, 0, big_cap - 1)
    merged = jnp.where(
        small_ok[:, None, None, None], small_out, big_out[big_src]
    )
    # duplicate pad entries of `perm` overwrite inv[perm[n-1]] with a pad
    # row index — harmless: pad rows are replicas of that same window
    inv = jnp.zeros((n_pad,), jnp.int32).at[perm].set(
        jnp.arange(n_pad, dtype=jnp.int32)
    )
    return merged[inv[:n]], n_big, overflow
