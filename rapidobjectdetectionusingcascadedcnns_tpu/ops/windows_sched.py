"""Support-bounded scheduled Pallas extraction for *static* window sets.

Second-generation TPU kernel for the stage-0 dense-pyramid extraction
(the re-implementation of the reference's resize+slice/crop loop,
/root/reference/app/inference_cascade_app.py:346-401). The v1 kernel
(:mod:`.windows_pallas`) contracts every window tile against the FULL image
height/width: for a 12x12 window cut from a 34px box on a 450x450 frame,
~93% of the vertical matmul FLOPs and of the VPU weight-build work touch
rows/columns the window never samples.

Because stage-0 window geometry is a pure function of the static
:class:`~.pyramid.PyramidPlan`, the remedy is precomputed on the host into
an :class:`ExtractionSchedule`:

  * every WINDOW is assigned the smallest *aligned block cell* (R rows x
    C cols from a fixed ladder, R | h_pad and C | w_pad) containing its
    two-tap support;
  * windows are grouped by cell (same rung AND same block index — windows
    of different pyramid levels share freely), each group padded to the
    kernel tile, so a tile's windows share their cell by construction: no
    spatial-order heuristics and no per-tile escalation;
  * groups are concatenated into classes by cell size, one `pallas_call`
    per class; the image rides as three channel-plane inputs whose
    BlockSpec index_map reads the per-tile block offsets from a
    scalar-prefetch operand — the canonical Mosaic gather pattern, so cell
    loads are pipelined (double-buffered) across grid steps while the
    kernel builds triangle weights over the R x C cell only.

Numerics are bit-identical to the v1 kernel (and so match the XLA
formulation's u8-quantized output): the sampling positions are computed
on-device by the *same* jnp expressions (host-side float mirrors round
differently once XLA fuses an FMA — the schedule's supports are therefore
computed from a host estimate widened by a one-row/col guard band), the
dropped rows/columns contribute exactly-zero taps (f32 additions with 0.0
are exact), and in-cell tap weights equal the global ones (cell-local
coordinates differ by an exact integer subtraction).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .windows_pallas import _tile_windows, pallas_available


def _sample_positions_jnp(boxes, h: int, w: int, out_h: int, out_w: int):
    """(N, out_h) / (N, out_w) float32 sampling positions — the exact
    expressions of windows._crop_and_resize_core / windows_pallas."""
    boxes = boxes.astype(jnp.float32)
    xmin, ymin, xmax, ymax = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    box_w = xmax - xmin
    box_h = ymax - ymin
    oy = (jnp.arange(out_h, dtype=jnp.float32) + 0.5)[None, :]
    ox = (jnp.arange(out_w, dtype=jnp.float32) + 0.5)[None, :]
    local_y = oy * (box_h[:, None] / out_h) - 0.5
    local_x = ox * (box_w[:, None] / out_w) - 0.5
    local_y = jnp.clip(local_y, 0.0, jnp.maximum(box_h[:, None] - 1.0, 0.0))
    local_x = jnp.clip(local_x, 0.0, jnp.maximum(box_w[:, None] - 1.0, 0.0))
    sy = jnp.clip(local_y + ymin[:, None], 0.0, h - 1.0)
    sx = jnp.clip(local_x + xmin[:, None], 0.0, w - 1.0)
    return sy, sx


def _estimate_sample_positions(
    boxes: np.ndarray, h: int, w: int, out_h: int, out_w: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Host float32 estimate of the sampling positions (same formulas; may
    differ from the device values in the last ulp — only used for support
    classing, with a guard band)."""
    boxes = boxes.astype(np.float32)
    xmin, ymin, xmax, ymax = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    box_w = xmax - xmin
    box_h = ymax - ymin
    oy = (np.arange(out_h, dtype=np.float32) + np.float32(0.5))[None, :]
    ox = (np.arange(out_w, dtype=np.float32) + np.float32(0.5))[None, :]
    local_y = oy * (box_h[:, None] / np.float32(out_h)) - np.float32(0.5)
    local_x = ox * (box_w[:, None] / np.float32(out_w)) - np.float32(0.5)
    local_y = np.clip(local_y, 0.0, np.maximum(box_h[:, None] - 1.0, 0.0))
    local_x = np.clip(local_x, 0.0, np.maximum(box_w[:, None] - 1.0, 0.0))
    sy = np.clip(local_y + ymin[:, None], 0.0, np.float32(h - 1))
    sx = np.clip(local_x + xmin[:, None], 0.0, np.float32(w - 1))
    return sy.astype(np.float32), sx.astype(np.float32)


@dataclass
class _ClassSchedule:
    cell_r: int  # cell rows (a ladder rung dividing h_pad)
    cell_c: int  # cell cols (a ladder rung dividing w_pad)
    sel: np.ndarray  # (tiles,) int64 tile indices assigned to this class
    offs: np.ndarray  # (2, tiles) int32 per-tile (row, col) offsets in CELL units

    @property
    def n_tiles(self) -> int:
        return int(self.sel.size)


@dataclass
class ExtractionSchedule:
    """Host-precomputed extraction program for one static window set."""

    img_h: int
    img_w: int
    h_pad: int  # rows padded so every row-ladder rung divides them
    w_pad: int  # cols padded so every col-ladder rung divides them
    out_h: int
    out_w: int
    tile: int
    n_windows: int
    classes: List[_ClassSchedule] = field(default_factory=list)
    positions: Optional[np.ndarray] = None  # (n,) output row of ORIGINAL window i
    order: Optional[np.ndarray] = None  # (n_slots,) original window id per slot
    # scheduled-order metadata (reorder=False consumers): original window id
    # per output row (== order), and a validity mask (False on replicated
    # group-padding rows)
    ids: Optional[np.ndarray] = None  # (n_slots,)
    valid: Optional[np.ndarray] = None  # (n_slots,) bool


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def build_schedule(
    boxes: np.ndarray,
    img_h: int,
    img_w: int,
    out_h: int,
    out_w: int,
) -> Optional[ExtractionSchedule]:
    """Build the cell-grouped schedule for a static (N, 4) float box array.

    Each window is binned into the smallest aligned ladder cell containing
    its (guard-banded) two-tap support; same-cell windows are grouped and
    tiled together, groups padded to the kernel tile by replicating their
    last window (masked via ``valid``). Extraction returns windows in the
    ORIGINAL box order (``reorder=True``) or in scheduled order with the
    ``ids``/``valid`` row maps (``reorder=False``).

    Returns None when the geometry cannot profit from cell bounding (tiny
    images) or the tile shape degenerates (v1's lane-alignment limit) —
    callers fall back to the v1 kernel / XLA path.
    """
    tile = _tile_windows(out_h, out_w)
    if tile * out_w > 4096:
        return None
    if img_h < 128 or img_w < 256:
        return None  # cells would cover the whole image anyway

    n = boxes.shape[0]
    if n == 0:
        return None
    # cells are BLOCK cells (index_map-addressed): pad so every ladder rung
    # divides the padded dims
    h_pad = _ceil_to(img_h, 256)
    w_pad = _ceil_to(img_w, 256)
    sy, sx = _estimate_sample_positions(boxes, img_h, img_w, out_h, out_w)

    # per-WINDOW two-tap support, widened by a one-row/col guard band (the
    # device f32 positions may differ in the last ulp, which can flip a
    # floor() at integer boundaries)
    y_lo = np.floor(sy).astype(np.int64)
    x_lo = np.floor(sx).astype(np.int64)
    rlo = np.maximum(y_lo.min(axis=1) - 1, 0)
    rhi = np.minimum(y_lo.max(axis=1) + 2, img_h - 1)
    clo = np.maximum(x_lo.min(axis=1) - 1, 0)
    chi = np.minimum(x_lo.max(axis=1) + 2, img_w - 1)

    # only rungs that DIVIDE the padded dim are admissible: an aligned grid of
    # a non-dividing rung (e.g. 512 when h_pad = 768) would create cells whose
    # block offsets don't tile the padded image, breaking the invariant that
    # every cell class addresses in-bounds blocks of its own rung size
    r_ladder = [r for r in (64, 128, 256, 512) if r < h_pad and h_pad % r == 0]
    r_ladder += [h_pad]
    c_ladder = [c for c in (256, 512) if c < w_pad and w_pad % c == 0] + [w_pad]

    # smallest rung whose aligned grid contains the support in one cell
    cell_r = np.full(n, h_pad, np.int64)
    for r in reversed(r_ladder):
        cell_r[(rlo // r) == (rhi // r)] = r
    cell_c = np.full(n, w_pad, np.int64)
    for c in reversed(c_ladder):
        cell_c[(clo // c) == (chi // c)] = c
    roff = rlo // cell_r  # block units
    coff = clo // cell_c

    sched = ExtractionSchedule(
        img_h=img_h, img_w=img_w, h_pad=h_pad, w_pad=w_pad,
        out_h=out_h, out_w=out_w, tile=tile, n_windows=n,
    )

    slot_ids: List[np.ndarray] = []  # original window id per output slot
    valid_parts: List[np.ndarray] = []
    tile_counter = 0
    for r in r_ladder:
        for c in c_ladder:
            in_class = (cell_r == r) & (cell_c == c)
            if not in_class.any():
                continue
            idx = np.nonzero(in_class)[0]
            # group by cell block index; stable order keeps plan order
            key = roff[idx] * (w_pad // c) + coff[idx]
            grp_order = np.argsort(key, kind="stable")
            idx = idx[grp_order]
            key = key[grp_order]
            starts = np.concatenate(
                [[0], np.nonzero(np.diff(key))[0] + 1, [idx.size]]
            )
            offs_tiles = []
            for g in range(starts.size - 1):
                members = idx[starts[g] : starts[g + 1]]
                g_tiles = -(-members.size // tile)
                padded = np.concatenate(
                    [members, np.repeat(members[-1:], g_tiles * tile - members.size)]
                )
                slot_ids.append(padded)
                v = np.zeros(g_tiles * tile, np.bool_)
                v[: members.size] = True
                valid_parts.append(v)
                offs_tiles.append(
                    np.stack(
                        [
                            np.repeat(roff[members[0]], g_tiles),
                            np.repeat(coff[members[0]], g_tiles),
                        ]
                    )
                )
            n_tiles_cls = sum(o.shape[1] for o in offs_tiles)
            sched.classes.append(
                _ClassSchedule(
                    cell_r=int(r),
                    cell_c=int(c),
                    sel=np.arange(tile_counter, tile_counter + n_tiles_cls),
                    # (2, tiles): SMEM prefetch operands are padded per
                    # leading row — (tiles, 2) would waste ~512B per tile
                    offs=np.concatenate(offs_tiles, axis=1).astype(np.int32),
                )
            )
            tile_counter += n_tiles_cls

    order = np.concatenate(slot_ids)  # (n_slots,) original id per slot
    valid = np.concatenate(valid_parts)
    positions = np.empty(n, np.int64)
    positions[order] = np.arange(order.size)  # any duplicate row is identical
    sched.order = order
    sched.ids = order.copy()
    sched.valid = valid
    sched.positions = positions
    return sched


def _sched_kernel(offs_ref, sy_ref, sx_ref, *refs, tile: int, c: int,
                  cell_r: int, cell_c: int, out_h: int, out_w: int,
                  quantize: bool, blockdiag: bool = False):
    plane_refs = refs[:c]
    out_ref = refs[c]
    v_scratch = refs[c + 1]

    r_iota = jax.lax.broadcasted_iota(
        jnp.int32, (tile * out_h, cell_r), 1
    ).astype(jnp.float32)
    ry = jnp.maximum(0.0, 1.0 - jnp.abs(r_iota - sy_ref[:, :])).astype(
        jnp.bfloat16
    )  # (tile*out_h, R)
    c_iota = jax.lax.broadcasted_iota(
        jnp.int32, (cell_c, tile * out_w), 0
    ).astype(jnp.float32)
    rx = jnp.maximum(0.0, 1.0 - jnp.abs(c_iota - sx_ref[:, :])).astype(
        jnp.bfloat16
    )  # (C, tile*out_w)

    for ci in range(c):
        v_scratch[:, :] = jnp.dot(
            ry, plane_refs[ci][:, :], preferred_element_type=jnp.float32
        )  # (tile*out_h, C) f32
        if blockdiag:
            # one horizontal matmul per tile; per-window results are the
            # diagonal blocks (see windows_pallas._resample_kernel)
            p = jnp.dot(
                v_scratch[:, :].astype(jnp.bfloat16),
                rx,
                preferred_element_type=jnp.float32,
            )
            for t in range(tile):
                o = p[t * out_h : (t + 1) * out_h, t * out_w : (t + 1) * out_w]
                if quantize:
                    o = jnp.clip(jnp.round(o), 0.0, 255.0)
                out_ref[
                    ci * out_h : (ci + 1) * out_h, t * out_w : (t + 1) * out_w
                ] = o.astype(out_ref.dtype)
        else:
            for t in range(tile):
                v_t = v_scratch[t * out_h : (t + 1) * out_h, :].astype(jnp.bfloat16)
                r_t = rx[:, t * out_w : (t + 1) * out_w]
                o = jnp.dot(v_t, r_t, preferred_element_type=jnp.float32)
                if quantize:
                    o = jnp.clip(jnp.round(o), 0.0, 255.0)
                out_ref[
                    ci * out_h : (ci + 1) * out_h, t * out_w : (t + 1) * out_w
                ] = o.astype(out_ref.dtype)


def _run_class(planes, sy_local, sx_local, cls: _ClassSchedule,
               sched: ExtractionSchedule, quantize: bool, interpret: bool,
               out_dtype, blockdiag: bool = False):
    tile, out_h, out_w = sched.tile, sched.out_h, sched.out_w
    c = len(planes)
    plane_spec = pl.BlockSpec(
        (cls.cell_r, cls.cell_c),
        # block indices straight from the prefetched per-tile offsets —
        # Mosaic double-buffers these loads across grid steps
        lambda i, offs: (offs[0, i], offs[1, i]),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(cls.n_tiles,),
        in_specs=[
            pl.BlockSpec((tile * out_h, 1), lambda i, offs: (i, 0)),
            pl.BlockSpec((1, tile * out_w), lambda i, offs: (0, i)),
        ]
        + [plane_spec] * c,
        out_specs=pl.BlockSpec((c * out_h, tile * out_w), lambda i, offs: (0, i)),
        scratch_shapes=[pltpu.VMEM((tile * out_h, cls.cell_c), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(
            _sched_kernel,
            tile=tile,
            c=c,
            cell_r=cls.cell_r,
            cell_c=cls.cell_c,
            out_h=out_h,
            out_w=out_w,
            quantize=quantize,
            blockdiag=blockdiag,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (c * out_h, cls.n_tiles * tile * out_w), out_dtype
        ),
        interpret=interpret,
    )(jnp.asarray(cls.offs), sy_local, sx_local, *planes)


def extract_scheduled(
    image: jnp.ndarray,
    boxes: jnp.ndarray,
    schedule: ExtractionSchedule,
    *,
    quantize: bool = True,
    interpret: Optional[bool] = None,
    out_dtype=jnp.float32,
    reorder: bool = True,
    blockdiag: bool = False,
) -> jnp.ndarray:
    """Extract all scheduled windows from ``image`` (H, W, C).

    ``boxes`` must be the same (N, 4) window set the schedule was built
    from (it is traced — sampling positions are computed on device so they
    match the other extraction paths bit-for-bit). Returns
    (N, out_h, out_w, C) ``out_dtype`` windows in the original window
    order; with ``reorder=False`` the (N_padded, ...) windows stay in
    SCHEDULED order (see ``schedule.ids``/``schedule.valid``) and the
    un-permutation gather is skipped — the mode the cascade uses, since its
    window-id channel carries identity anyway. Traceable (jit/vmap-safe).
    """
    if interpret is None:
        interpret = not pallas_available()
    h, w, c = image.shape
    assert (h, w) == (schedule.img_h, schedule.img_w), "schedule/image mismatch"
    image = image.astype(jnp.float32)
    pad_r = schedule.h_pad - h
    pad_c = schedule.w_pad - w
    if pad_r or pad_c:
        image = jnp.pad(image, ((0, pad_r), (0, pad_c), (0, 0)))
    planes = [
        image[:, :, ci].astype(jnp.bfloat16) for ci in range(c)
    ]  # (h_pad, w_pad) each

    tile, out_h, out_w = schedule.tile, schedule.out_h, schedule.out_w
    n_tiles = sum(cl.n_tiles for cl in schedule.classes)
    sy, sx = _sample_positions_jnp(boxes, h, w, out_h, out_w)
    slots = jnp.asarray(schedule.order)  # (n_slots,) original id per slot
    sy_t = sy[slots].reshape(n_tiles, tile * out_h)
    sx_t = sx[slots].reshape(n_tiles, tile * out_w)

    outs = []
    for cls in schedule.classes:
        sel = jnp.asarray(cls.sel)
        roff = jnp.asarray(
            (cls.offs[0] * cls.cell_r).astype(np.float32)[:, None]
        )
        coff = jnp.asarray(
            (cls.offs[1] * cls.cell_c).astype(np.float32)[:, None]
        )
        sy_local = (sy_t[sel] - roff).reshape(-1, 1)
        sx_local = (sx_t[sel] - coff).reshape(1, -1)
        out = _run_class(
            planes, sy_local, sx_local, cls, schedule, quantize,
            interpret, out_dtype, blockdiag,
        )
        # (C*out_h, tiles*tile*out_w) -> (tiles*tile, out_h, out_w, C)
        out = out.reshape(c, out_h, cls.n_tiles * tile, out_w)
        outs.append(jnp.transpose(out, (2, 1, 3, 0)))
    all_windows = jnp.concatenate(outs, axis=0)
    if not reorder:
        return all_windows
    return all_windows[jnp.asarray(schedule.positions)]


# ---------------------------------------------------------------------------
# plan-keyed schedule cache


@functools.lru_cache(maxsize=64)
def schedule_for_plan(plan, out_h: int, out_w: int) -> Optional[ExtractionSchedule]:
    """Schedule for a pyramid plan's full static window set (stage-0
    extraction). Cached per plan; plans are frozen/hashable."""
    from .pyramid import window_table

    table = window_table(plan)
    return build_schedule(
        table["boxes_float"].astype(np.float32),
        plan.img_h,
        plan.img_w,
        out_h,
        out_w,
    )
