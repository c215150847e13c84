"""Cascade inference engine: jitted multi-stage early-reject over window batches.

This replaces the reference's cascade loop
(app/inference_cascade_app.py:119-342), which crosses the host<->device
boundary per batch per stage and filters survivors in Python, with a single
jitted XLA program per image-size bucket:

  stage 0:  fused pyramid resize + dense window gather  (ops/windows.py)
            -> tiny CNN over all windows -> foreground probs
  between:  *mask compaction* — survivors are moved to the front of a
            fixed-capacity buffer by an argsort on (alive, prob) and the
            next stage's windows are re-gathered at the higher resolution
            directly from the original image (crop_and_resize), bottlenecks
            carried through the same gather
  stage i:  CNN with previous-stage bottleneck concat -> probs -> mask &
  last:     surviving (window index, confidence) pairs leave the device;
            NMS clustering + vertical enlargement run on host (candidate
            counts are tiny by then).

The data-dependent survivor counts of the reference become static-capacity
buffers chosen from pyramid math, so each stage compiles once; confidences
follow the reference's LAST/AVG/MULT accumulation modes
(config.py:115-122, inference_cascade_app.py:226-232,317-327).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as cf
from ..ops import nms as nms_ops
from ..ops.pyramid import PyramidPlan, build_plan, window_table
from ..ops.windows import crop_and_resize_impl, extract_windows
from . import cnn


@dataclass
class CascadeModel:
    """Trained cascade: per-stage params/configs/standardization stats."""

    stage_params: List[cnn.Params]
    stage_configs: List[cnn.StageConfig]
    stage_means: List[np.ndarray]  # (H, W, C) float32 per stage
    stage_stds: List[np.ndarray]

    @property
    def n_nets(self) -> int:
        return len(self.stage_params)

    @property
    def input_sizes(self) -> List[int]:
        return [c.input_size for c in self.stage_configs]


@dataclass
class DetectionResult:
    """Detections for one image, boxes in original pixel coords (xyxy)."""

    boxes: np.ndarray  # (M, 4) after NMS
    confidences: np.ndarray  # (M,)
    raw_boxes: np.ndarray  # pre-NMS surviving windows (K, 4)
    raw_confidences: np.ndarray  # (K,)
    n_windows: int  # total windows evaluated at stage 0
    n_survivors_per_stage: List[int]
    # stage-0 window ids (plan ordering) of the pre-NMS survivors — the
    # stable identity used by the end-to-end reference oracle to compare
    # survivor sets detection-for-detection (tests/test_e2e_oracle.py)
    raw_window_ids: Optional[np.ndarray] = None
    # per-re-extract big-class overflow counts from the dynamic row-bounded
    # kernel (ops/windows_dyn.py); nonzero means the result was re-dispatched
    # (or, with re-dispatch off, contains garbage for that many windows)
    reextract_overflows: Optional[List[int]] = None


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _balanced_chunk(n: int, chunk: int) -> int:
    """Largest-balanced chunk size: same chunk COUNT as ``chunk`` would give,
    but sized to n/count (128-aligned) so the last chunk is not mostly
    padding. 16512 windows with chunk 16384 would otherwise run TWO full
    16384-row chunks — 99% wasted work in the second (measured 15.4 -> 5.5 ms
    on the FDDB stage-1 CNN, tools/profile_reextract.py)."""
    n_chunks = -(-n // chunk)
    return _round_up(-(-n // n_chunks), 128)


def _precast_params(params, cfg: cnn.StageConfig):
    """Pre-cast the weights apply_stage consumes in compute dtype so the
    casts are loop-invariant (outside lax.map) instead of re-reading the f32
    masters every chunk iteration — the stage-2 fc1 alone is 151 MB. fc2's
    bias stays f32 (apply_stage adds it to the f32 logits)."""
    cdt = cfg.compute_dtype
    out = dict(params)
    if "conv" in params:
        out["conv"] = [
            {k: v.astype(cdt) for k, v in layer.items()}
            for layer in params["conv"]
        ]
    if "fc1" in params:
        out["fc1"] = {k: v.astype(cdt) for k, v in params["fc1"].items()}
    if "fc2" in params:
        out["fc2"] = {"W": params["fc2"]["W"].astype(cdt), "b": params["fc2"]["b"]}
    return out


def default_capacity_schedule(n_windows: int, n_stages: int) -> List[int]:
    """Fixed survivor capacities after each non-final stage.

    Sized for *trained* cascades: a working stage 0 rejects the vast
    majority of windows (measured 1-5% survivors on the synthetic corpus;
    the reference's design intent, README.md:69), so 1/8 then /4 per stage
    leaves 2-10x headroom while keeping the per-stage crop+CNN cost
    proportional to real survivor counts. The schedule is SAFE to undershoot:
    saturation re-dispatch (CascadeDetector._handle_saturation) transparently
    re-runs an image with doubled capacities, so detections always equal the
    reference's unbounded survivor sets; a degenerate untrained stage only
    pays retry compiles and a warning. Floors keep tiny pyramids functional;
    multiples of 128 keep buffers lane-aligned for the TPU.
    """
    caps = []
    for i in range(1, n_stages):
        frac = n_windows // (8 * 4 ** (i - 1))
        caps.append(min(n_windows, _round_up(max(256, frac), 128)))
    return caps


def escalate_capacities(
    capacities: Sequence[int], n_windows: int
) -> Optional[List[int]]:
    """Double every survivor capacity, clamped by the window count that can
    actually reach each stage. Returns None when the buffers are already
    fully open (nothing could have been dropped) — the shared step of the
    saturation re-dispatch loop used by both the single-device detector and
    the window-sharded path (reference-unbounded survivor semantics,
    app/inference_cascade_app.py:217-240)."""
    new_caps, bound = [], n_windows
    for c in capacities:
        nc = min(bound, _round_up(c * 2, 128))
        new_caps.append(nc)
        bound = nc
    if tuple(new_caps) == tuple(capacities):
        return None
    return new_caps


def resolve_extraction_mode(plan: PyramidPlan) -> str:
    """'gather' (per-level fused resize+gather) for coarse pyramids, 'crop'
    (chunked interpolation einsum) for dense ones — the unrolled gather graph
    scales with level count, the crop program does not."""
    configured = cf.get("window_extraction_mode")
    if configured in ("gather", "crop"):
        return configured
    return "crop" if plan.n_scales > 48 else "gather"


def resolve_resample_impl() -> str:
    """'pallas' (fused VMEM-resident window-resampling kernel,
    ops/windows_pallas.py) on real TPU backends, 'xla' (interpolation-matrix
    einsums) elsewhere; `use_pallas_resample` forces either, and 'pallas2'
    additionally routes stage-0 through the scheduled support-bounded kernel
    (ops/windows_sched.py; `stage0_scheduled_extraction` is the equivalent
    toggle on top of the auto choice). Resolved on the host per dispatch and
    threaded as a static jit argument so a config flip is never baked into a
    cached executable."""
    configured = cf.get("use_pallas_resample")
    sched_flag = cf.get("stage0_scheduled_extraction")

    def with_dyn(impl: str) -> str:
        # 'pallas2dyn' additionally routes stage-1/2 re-extraction through
        # the dynamic row-bounded kernel (ops/windows_dyn.py). Opt-in only:
        # at FDDB density the v1 serial kernel measured 4.9 ms vs 22.4 ms
        # for the lattice scheme (tools/profile_reextract.py) because
        # re-extraction stopped being the bottleneck once chunk balancing
        # landed; 'auto' therefore resolves to off.
        if impl == "pallas2" and cf.get("dyn_reextract") == "on":
            return "pallas2dyn"
        return impl

    if configured in ("pallas", "xla", "pallas2", "pallas2dyn"):
        if configured == "pallas" and sched_flag == "on":
            return with_dyn("pallas2")
        return with_dyn(configured)
    if configured is True:
        # the legacy boolean form honors the scheduled-extraction toggle the
        # same way the string 'pallas' form does
        return with_dyn("pallas2") if sched_flag == "on" else "pallas"
    if configured is False:
        return "xla"
    try:
        if jax.default_backend() != "tpu":
            return "xla"
    except Exception:  # pragma: no cover - backend probing
        return "xla"
    # scheduled stage-0 (ops/windows_sched.py) is the TPU default: measured
    # 68.8 vs 77.2 ms/img full-cascade at FDDB density (tools/
    # profile_cascade_device.py), identical detections; "off" drops to v1
    return "pallas" if sched_flag == "off" else with_dyn("pallas2")


def resolve_compaction() -> str:
    """Survivor-compaction strategy, resolved on the host per dispatch (see
    config.py `cascade_compaction`): "scan" whenever saturation re-dispatch
    guarantees untruncated survivor sets, "rank" when truncation semantics
    (keep-strongest) must hold because re-dispatch is disabled."""
    configured = cf.get("cascade_compaction")
    if configured in ("rank", "scan"):
        return configured
    return "scan" if cf.get("cascade_saturation_redispatch") else "rank"


def _compact_indices(alive, p_fg, cap: int, compaction: str):
    """Select up to ``cap`` surviving rows from a stage's full result buffer.

    Returns ``(keep, alive_out)``: row indices to gather and their alive
    mask. Two strategies, identical final detections whenever the buffer
    does not truncate (and saturation re-dispatch re-runs any image where it
    would):

      * ``"rank"`` — full argsort on (alive, strength): alive first,
        strongest first. O(n log^2 n) device sort; truncation keeps the
        strongest windows (the documented opt-out semantics when
        ``cascade_saturation_redispatch`` is off).
      * ``"scan"`` — cumsum + vectorized binary search: the j-th kept row is
        the j-th alive row in window-enumeration order, which is exactly the
        order the reference accumulates survivors in
        (app/inference_cascade_app.py:217-240). O(n) + O(cap log n) — no
        130k-element sort in the FDDB-density program.
    """
    if compaction == "scan":
        c = jnp.cumsum(alive.astype(jnp.int32))
        n_alive = c[-1]
        keep = jnp.searchsorted(
            c, jnp.arange(1, cap + 1, dtype=jnp.int32), side="left"
        )
        keep = jnp.minimum(keep, alive.shape[0] - 1).astype(jnp.int32)
        alive_out = jnp.arange(cap, dtype=jnp.int32) < jnp.minimum(
            n_alive, cap
        )
        return keep, alive_out
    order = jnp.argsort(-(alive.astype(jnp.float32) * (1.0 + p_fg)))
    keep = order[:cap]
    return keep, alive[keep]


def resolve_thresholds(n_stages: int) -> List[float]:
    """Scalar-or-list foreground_confidence_threshold
    (config.py:64-73, inference_cascade_app.py:165-175)."""
    thr = cf.get("foreground_confidence_threshold")
    if isinstance(thr, (int, float)):
        return [float(thr)] * n_stages
    if len(thr) != n_stages:
        raise ValueError("Invalid foreground_confidence_threshold.")
    return [float(t) for t in thr]


def _apply_stage_on_boxes_chunked(
    image_f: jnp.ndarray,
    boxes: jnp.ndarray,  # (N, 4) float32 on the original image
    bneck_in,  # (N, B) or None
    params,
    stage_cfg: cnn.StageConfig,
    mean: jnp.ndarray,
    std: jnp.ndarray,
    chunk: int,
    high_precision: bool,
    resample_impl: str = "xla",
):
    """Fused crop_and_resize + stage CNN over window chunks.

    Materializing all windows (and the conv intermediates behind them) for a
    dense pyramid would need GBs of HBM; lax.map over fixed-size chunks keeps
    the live set to one chunk while XLA pipelines the chunks. Returns
    (probs (N, 2), bottleneck (N, B_out))."""
    size = stage_cfg.input_size
    n = boxes.shape[0]
    prec = jax.lax.Precision.HIGHEST if high_precision else None
    if n <= chunk:
        wins = crop_and_resize_impl(
            image_f, boxes, size, size, True, high_precision, resample_impl
        )
        out = cnn.apply_stage(
            params, stage_cfg, (wins - mean) / std, bneck_in, precision=prec
        )
        return out["probs"], out["bottleneck"]

    chunk = _balanced_chunk(n, chunk)
    if not high_precision:
        params = _precast_params(params, stage_cfg)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    boxes_p = jnp.concatenate([boxes, jnp.broadcast_to(boxes[-1:], (pad, 4))])
    boxes_c = boxes_p.reshape(n_chunks, chunk, 4)
    if bneck_in is not None:
        bneck_p = jnp.concatenate(
            [bneck_in, jnp.broadcast_to(bneck_in[-1:], (pad, bneck_in.shape[1]))]
        )
        bneck_c = bneck_p.reshape(n_chunks, chunk, -1)
    else:
        bneck_c = jnp.zeros((n_chunks, chunk, 1), jnp.float32)

    def one(args):
        chunk_boxes, chunk_bneck = args
        wins = crop_and_resize_impl(
            image_f, chunk_boxes, size, size, True, high_precision, resample_impl
        )
        x = (wins - mean) / std
        bn = chunk_bneck if bneck_in is not None else None
        out = cnn.apply_stage(params, stage_cfg, x, bn, precision=prec)
        return out["probs"], out["bottleneck"]

    probs, bottleneck = jax.lax.map(one, (boxes_c, bneck_c))
    return (
        probs.reshape(n_chunks * chunk, -1)[:n],
        bottleneck.reshape(n_chunks * chunk, -1)[:n],
    )


def _apply_stage_on_windows_chunked(
    wins: jnp.ndarray,  # (N, s, s, C) extracted windows (any float dtype)
    bneck_in,  # (N, B) or None
    params,
    stage_cfg: cnn.StageConfig,
    mean: jnp.ndarray,
    std: jnp.ndarray,
    chunk: int,
    high_precision: bool = False,
):
    """Stage CNN over pre-extracted windows, lax.map'ed in fixed-size chunks
    (bounds the conv/fc intermediates to one chunk — same rationale as
    :func:`_apply_stage_on_boxes_chunked`, used when extraction already
    materialized the windows, e.g. the scheduled Pallas kernel)."""
    n = wins.shape[0]
    prec = jax.lax.Precision.HIGHEST if high_precision else None

    def stage(wc, bn):
        out = cnn.apply_stage(
            params,
            stage_cfg,
            (wc.astype(jnp.float32) - mean) / std,
            bn,
            precision=prec,
        )
        return out["probs"], out["bottleneck"]

    if n <= chunk:
        return stage(wins, bneck_in)

    chunk = _balanced_chunk(n, chunk)
    if not high_precision:
        params = _precast_params(params, stage_cfg)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    wins_p = jnp.concatenate(
        [wins, jnp.broadcast_to(wins[-1:], (pad,) + wins.shape[1:])]
    )
    wins_c = wins_p.reshape((n_chunks, chunk) + wins.shape[1:])
    if bneck_in is not None:
        bneck_p = jnp.concatenate(
            [bneck_in, jnp.broadcast_to(bneck_in[-1:], (pad, bneck_in.shape[1]))]
        )
        bneck_c = bneck_p.reshape(n_chunks, chunk, -1)
    else:
        bneck_c = jnp.zeros((n_chunks, chunk, 1), jnp.float32)

    def one(args):
        wc, bc = args
        return stage(wc, bc if bneck_in is not None else None)

    probs, bottleneck = jax.lax.map(one, (wins_c, bneck_c))
    return (
        probs.reshape(n_chunks * chunk, -1)[:n],
        bottleneck.reshape(n_chunks * chunk, -1)[:n],
    )


def _stage0_schedule(plan: PyramidPlan, size: int, resample_impl: str,
                     high_precision: bool):
    """The scheduled support-bounded extraction plan for stage 0, or None
    when the impl/precision rules it out or the plan admits no schedule.
    One definition shared by the traced programs (which consume it) and the
    host unpack paths (which need ``sched.ids`` to map scheduled row order
    back to plan window order)."""
    if resample_impl not in ("pallas2", "pallas2dyn") or high_precision:
        return None
    from ..ops import windows_sched

    return windows_sched.schedule_for_plan(plan, size, size)


def _stage0_apply(
    image_f: jnp.ndarray,
    boxes_float: jnp.ndarray,
    plan: PyramidPlan,
    params,
    stage_cfg: cnn.StageConfig,
    mean0: jnp.ndarray,
    std0: jnp.ndarray,
    chunk: int,
    extraction_mode: str,
    resample_impl: str,
    high_precision: bool,
):
    """Dense-pyramid stage-0 classification (shared by the cascade core and
    the single-net detector, which IS a dense stage-0 pass at its own input
    resolution — reference app/inference_app.py:117-154).

    gather mode: one fused resize+gather per pyramid level (best for coarse
    pyramids); crop mode: one chunked interpolation-einsum over the whole
    window set (program size independent of pyramid density — required for
    FDDB-style 1.005 pyramids with ~500 levels). On TPU the crop mode's
    resample runs the scheduled support-bounded Pallas kernel
    (ops/windows_sched.py) when the static plan admits a schedule.

    Returns (probs (M, 2), bottleneck (M, B), window_ids0 (M,) int32 or
    None, valid0 (M,) bool or None): ids/valid are non-None exactly when the
    scheduled kernel ran — its output rows are in scheduled order with
    replicated pad rows; ids map rows back to plan order, valid masks pads.
    """
    if extraction_mode == "crop":
        sched = _stage0_schedule(
            plan, stage_cfg.input_size, resample_impl, high_precision
        )
        if sched is not None:
            from ..ops import windows_sched

            # scheduled order is consumed as-is: the window-id channel
            # carries identity, so un-permuting 100+ MB of windows would be
            # pure waste — ids map rows back to plan order and the
            # replicated pad rows are masked out of the alive set
            wins0 = windows_sched.extract_scheduled(
                image_f, boxes_float, sched, out_dtype=jnp.bfloat16,
                reorder=False,
                # one horizontal matmul per tile beats the serial per-window
                # loop on the small scheduled cells (21.7 vs 24.8 ms at FDDB
                # density, tools/profile_reextract.py); bit-identical output
                blockdiag=True,
            )
            probs0, bottleneck = _apply_stage_on_windows_chunked(
                wins0, None, params, stage_cfg, mean0, std0, chunk
            )
            return (
                probs0,
                bottleneck,
                jnp.asarray(sched.ids.astype(np.int32)),
                jnp.asarray(sched.valid),
            )
        probs0, bottleneck = _apply_stage_on_boxes_chunked(
            image_f,
            boxes_float,
            None,
            params,
            stage_cfg,
            mean0,
            std0,
            chunk,
            high_precision,
            "pallas" if resample_impl in ("pallas2", "pallas2dyn") else resample_impl,
        )
        return probs0, bottleneck, None, None

    windows = extract_windows(image_f, plan)  # (N0, s0, s0, C)
    x = (windows - mean0) / std0
    out0 = cnn.apply_stage(
        params,
        stage_cfg,
        x,
        precision=jax.lax.Precision.HIGHEST if high_precision else None,
    )
    return out0["probs"], out0["bottleneck"], None, None


def _cascade_core(
    image: jnp.ndarray,
    coords_norm: jnp.ndarray,  # (N0, 4) int32 window coords on original image
    boxes_float: jnp.ndarray,  # (N0, 4) float32 exact window geometry
    stage_params: Tuple[cnn.Params, ...],
    stage_stats: Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...],  # (mean, std) pairs
    plan: PyramidPlan,
    stage_configs: Tuple[cnn.StageConfig, ...],
    capacities: Tuple[int, ...],
    confidence_mode: str,
    thresholds: Tuple[float, ...],
    high_precision: bool = False,
    extraction_mode: str = "gather",
    chunk: int = 16384,
    nms_min_neighbors: int = -1,
    resample_impl: str = "xla",
    compaction: str = "rank",
    nms_eps: float = 0.2,
):
    """Full-cascade single-image inference (traceable core).

    Returns (window_ids (C_last,), confidences (C_last,), alive (C_last,),
    diagnostics (2*n_stages - 1,)). ``diagnostics`` holds the per-stage
    pre-compaction survivor counts (n_stages) followed by the per-re-extract
    big-class overflow counts (n_stages - 1; always 0 unless the dynamic
    row-bounded kernel ran and its big class overflowed — the host must
    re-dispatch such an image, the overflowed windows carry garbage pixels).
    With ``nms_min_neighbors >= 0`` the groupRectangles clustering also runs
    on device (ops/nms.py group_rectangles_jax) and the returned tuple gains
    (cluster_xywh (C_last, 4), cluster_weights (C_last,),
    cluster_keep (C_last,)) — the pure-device serving tail: nothing but the
    final packed result ever leaves the chip.
    """
    n_stages = len(stage_configs)
    image_f = image.astype(jnp.float32)

    mean0, std0 = stage_stats[0]
    probs0, bottleneck, window_ids0, valid0 = _stage0_apply(
        image_f,
        boxes_float,
        plan,
        stage_params[0],
        stage_configs[0],
        mean0,
        std0,
        chunk,
        extraction_mode,
        resample_impl,
        high_precision,
    )
    n_windows0 = probs0.shape[0]
    p_fg = probs0[:, 1]
    alive = p_fg > thresholds[0]
    if valid0 is not None:
        alive = alive & valid0
    if confidence_mode == cf.FINAL_CONFIDENCE_CALCULATION_AVG:
        conf = p_fg
    elif confidence_mode == cf.FINAL_CONFIDENCE_CALCULATION_MULT:
        conf = p_fg
    else:  # LAST
        conf = p_fg

    window_ids = (
        window_ids0
        if window_ids0 is not None
        else jnp.arange(n_windows0, dtype=jnp.int32)
    )
    survivors = [jnp.sum(alive.astype(jnp.int32))]
    overflows = []  # per re-extract big-class overflow (dyn kernel only)

    for i in range(1, n_stages):
        cap = capacities[i - 1]
        # ---- compaction: select survivors into the fixed-capacity buffer
        # ("scan" keeps reference window order, "rank" sorts by strength) ----
        keep, alive = _compact_indices(alive, p_fg, cap, compaction)
        conf = conf[keep]
        p_fg = p_fg[keep]
        window_ids = window_ids[keep]
        bottleneck = bottleneck[keep]

        # ---- re-gather surviving windows at the next resolution ----
        boxes = coords_norm[window_ids].astype(jnp.float32)
        mean_i, std_i = stage_stats[i]
        bneck_in = (
            bottleneck if stage_configs[i].bottleneck_in_size is not None else None
        )
        size_i = stage_configs[i].input_size
        from ..ops import windows_dyn

        use_dyn = (
            resample_impl == "pallas2dyn"
            and not high_precision
            and windows_dyn.dyn_supported(
                image.shape[0], image.shape[1], size_i, size_i, cap
            )
        )
        if use_dyn:
            # support-bounded re-extraction for dynamic survivor boxes
            # (ops/windows_dyn.py): row-bounded cells via the shift lattice,
            # big-class fallback with an overflow counter the host watches
            wins_i, _n_big, ovf = windows_dyn.extract_rowbound(
                image_f,
                boxes,
                size_i,
                size_i,
                big_cap=windows_dyn.default_big_cap(
                    cap, size_i, size_i, image.shape[0]
                ),
                out_dtype=jnp.bfloat16,
            )
            probs_i, bottleneck = _apply_stage_on_windows_chunked(
                wins_i,
                bneck_in,
                stage_params[i],
                stage_configs[i],
                mean_i,
                std_i,
                chunk,
            )
            overflows.append(ovf)
        else:
            probs_i, bottleneck = _apply_stage_on_boxes_chunked(
                image_f,
                boxes,
                bneck_in,
                stage_params[i],
                stage_configs[i],
                mean_i,
                std_i,
                chunk,
                high_precision,
                "pallas"
                if resample_impl in ("pallas2", "pallas2dyn")
                else resample_impl,
            )
            overflows.append(jnp.zeros((), jnp.int32))
        p_i = probs_i[:, 1]
        stage_alive = p_i > thresholds[i]
        alive = alive & stage_alive

        if confidence_mode == cf.FINAL_CONFIDENCE_CALCULATION_AVG:
            conf = conf + p_i
        elif confidence_mode == cf.FINAL_CONFIDENCE_CALCULATION_MULT:
            conf = conf * p_i
        else:  # LAST: only the final net's score matters
            conf = p_i
        p_fg = p_i
        survivors.append(jnp.sum(alive.astype(jnp.int32)))

    # finalize confidence (inference_cascade_app.py:322-327)
    if confidence_mode == cf.FINAL_CONFIDENCE_CALCULATION_AVG:
        conf = conf / n_stages
    elif confidence_mode == cf.FINAL_CONFIDENCE_CALCULATION_MULT:
        conf = jnp.maximum(conf, cf.MIN_SCORE_FOR_FINAL_CONFIDENCE_CALCULATION_MULT)

    diagnostics = jnp.stack(survivors + overflows)  # (2*n_stages - 1,)

    if nms_min_neighbors >= 0:
        final_boxes = coords_norm[window_ids].astype(jnp.float32)
        xywh = jnp.stack(
            [
                final_boxes[:, 0],
                final_boxes[:, 1],
                final_boxes[:, 2] - final_boxes[:, 0],
                final_boxes[:, 3] - final_boxes[:, 1],
            ],
            axis=1,
        )
        cl_avg, cl_weights, cl_keep = nms_ops.group_rectangles_jax(
            xywh, alive, nms_min_neighbors, eps=nms_eps
        )
        return (
            window_ids,
            conf,
            alive,
            diagnostics,
            cl_avg,
            cl_weights,
            cl_keep,
        )

    return window_ids, conf, alive, diagnostics


def _pack_result(window_ids, conf, alive, diagnostics, *nms_tail):
    """Pack ALL per-image outputs into ONE flat float32 vector so host
    readback is a single transfer (remote/tunneled runtimes pay a round-trip
    per buffer). Layout: [ids (C), conf (C), alive (C),
    diagnostics (2*n_stages - 1: survivors then re-extract overflows)] plus,
    with the on-device NMS tail, [xywh (C, 4) row-major, weights (C),
    keep (C)]."""
    parts = [
        window_ids.astype(jnp.float32),
        conf.astype(jnp.float32),
        alive.astype(jnp.float32),
        diagnostics.astype(jnp.float32),
    ]
    if nms_tail:
        cl_avg, cl_weights, cl_keep = nms_tail
        parts += [
            cl_avg.astype(jnp.float32).reshape(-1),
            cl_weights.astype(jnp.float32),
            cl_keep.astype(jnp.float32),
        ]
    return jnp.concatenate(parts)


@functools.partial(
    jax.jit,
    static_argnames=(
        "plan",
        "stage_configs",
        "capacities",
        "confidence_mode",
        "thresholds",
        "high_precision",
        "extraction_mode",
        "chunk",
        "nms_min_neighbors",
        "resample_impl",
        "compaction",
        "nms_eps",
    ),
)
def _cascade_infer_device(image, coords_norm, boxes_float, stage_params,
                          stage_stats, plan, stage_configs, capacities,
                          confidence_mode, thresholds, high_precision=False,
                          extraction_mode="gather", chunk=16384,
                          nms_min_neighbors=-1, resample_impl="xla",
                          compaction="rank", nms_eps=0.2):
    """Single-image jitted cascade program (kept for the graft entry point)."""
    return _cascade_core(
        image, coords_norm, boxes_float, stage_params, stage_stats, plan,
        stage_configs, capacities, confidence_mode, thresholds, high_precision,
        extraction_mode, chunk, nms_min_neighbors, resample_impl, compaction,
        nms_eps,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "plan",
        "stage_configs",
        "capacities",
        "confidence_mode",
        "thresholds",
        "high_precision",
        "extraction_mode",
        "chunk",
        "nms_min_neighbors",
        "resample_impl",
        "compaction",
        "nms_eps",
    ),
)
def _cascade_infer_device_batch(images, coords_norm, boxes_float, stage_params,
                                stage_stats, plan, stage_configs, capacities,
                                confidence_mode, thresholds, high_precision=False,
                                extraction_mode="gather", chunk=16384,
                                nms_min_neighbors=-1, resample_impl="xla",
                                compaction="rank", nms_eps=0.2):
    """Batched cascade program: (B, H, W, C) images -> one packed float32
    (B, 3*C_last + 2*n_stages - 1 [+ device-NMS tail]) result array in ONE
    device round-trip (see _pack_result for the exact layout).

    Batching frames through a single program amortizes dispatch/transfer
    latency (essential when the chip sits behind a network tunnel) and gives
    XLA bigger, better-tiled convolutions; it is also the serving-shape for
    production video pipelines. The window axis inside the program can
    additionally be sharded over a mesh (parallel/mesh.py) for huge pyramids.
    """

    def one(image):
        out = _cascade_core(
            image, coords_norm, boxes_float, stage_params, stage_stats, plan,
            stage_configs, capacities, confidence_mode, thresholds,
            high_precision, extraction_mode, chunk, nms_min_neighbors,
            resample_impl, compaction, nms_eps,
        )
        return _pack_result(*out)

    return jax.vmap(one)(images)  # (B,) x _pack_result layout


@functools.partial(
    jax.jit,
    static_argnames=(
        "plan",
        "stage_configs",
        "capacities",
        "confidence_mode",
        "thresholds",
        "high_precision",
        "extraction_mode",
        "chunk",
        "nms_min_neighbors",
        "resample_impl",
        "compaction",
        "nms_eps",
    ),
)
def _cascade_infer_device_batch_yuv(y_planes, uv_planes, coords_norm, boxes_float,
                                    stage_params, stage_stats, plan, stage_configs,
                                    capacities, confidence_mode, thresholds,
                                    high_precision=False, extraction_mode="gather",
                                    chunk=16384, nms_min_neighbors=-1,
                                    resample_impl="xla", compaction="rank", nms_eps=0.2):
    """Batched cascade over YUV420 frames: (B, H, W) Y + (B, H/2, W/2, 2) UV
    uint8 -> same packed result as the RGB program. Half the ingress bytes of
    RGB24 (see ops/color.py); conversion fuses into the program."""
    from ..ops.color import yuv420_to_rgb

    def one(args):
        y, uv = args
        image = yuv420_to_rgb(y, uv)
        out = _cascade_core(
            image, coords_norm, boxes_float, stage_params, stage_stats, plan,
            stage_configs, capacities, confidence_mode, thresholds,
            high_precision, extraction_mode, chunk, nms_min_neighbors,
            resample_impl, compaction, nms_eps,
        )
        return _pack_result(*out)

    return jax.vmap(one)((y_planes, uv_planes))


class CascadeDetector:
    """Host-side orchestration around the jitted cascade program.

    One instance per trained :class:`CascadeModel`; jit caching is keyed on
    the pyramid plan (image-size bucket), so detecting over a video stream or
    a fixed-size benchmark compiles exactly once.
    """

    def __init__(self, model: CascadeModel, capacity_schedule=None, mesh=None):
        """``mesh``: optional jax.sharding.Mesh — frame batches are sharded
        over its data axis (multi-chip serving; parameters replicated). The
        reference is single-device only (SURVEY.md §2.6); this is the
        TPU-native scaling axis for inference: frames across chips, windows
        within a chip."""
        if model.n_nets < 2:
            raise ValueError("a cascade must consist of at least two nets")
        self.model = model
        self.mesh = mesh
        self._saturation_warned = False
        self._plan_cache: Dict[tuple, tuple] = {}
        self._capacity_override = capacity_schedule or cf.get(
            "cascade_capacity_schedule"
        )
        self._stats_device = tuple(
            (jnp.asarray(m), jnp.asarray(s))
            for m, s in zip(model.stage_means, model.stage_stds)
        )
        self._params_device = tuple(
            jax.tree_util.tree_map(jnp.asarray, p) for p in model.stage_params
        )
        if mesh is not None:
            from ..parallel import mesh as mesh_mod

            self._stats_device = mesh_mod.replicate(mesh, self._stats_device)
            self._params_device = mesh_mod.replicate(mesh, self._params_device)

    def _place_stack(self, stack: np.ndarray):
        """Upload a frame stack, sharded over the mesh's data axis if any.
        Pads the batch to a device multiple (padding results are dropped by
        the caller via the chunk index list)."""
        if self.mesh is None:
            return jnp.asarray(stack), stack.shape[0]
        from ..parallel import mesh as mesh_mod

        padded, n = mesh_mod.pad_to_multiple(stack, self.mesh.devices.size)
        return jax.device_put(padded, mesh_mod.batch_sharding(self.mesh)), n

    # -- plan/table caching per (image size, pyramid geometry) ----------
    # A plain per-instance dict (NOT functools.lru_cache on the method: that
    # would pin the detector for the process lifetime and silently ignore
    # config changes to the pyramid geometry between detects — EvaluateFDDBApp
    # mutates exactly these keys).
    def _plan_and_table(self, img_h: int, img_w: int):
        size0 = self.model.input_sizes[0]
        mwl = float(cf.get("min_window_length"))
        wsf = float(cf.get("window_scale_factor"))
        key = (img_h, img_w, size0, mwl, wsf)
        cached = self._plan_cache.get(key)
        if cached is not None:
            return cached
        plan = build_plan(img_h, img_w, size0, size0, mwl, wsf)
        table = window_table(plan)
        coords_norm = jnp.asarray(table["coords_norm"], dtype=jnp.int32)
        boxes_float = jnp.asarray(table["boxes_float"], dtype=jnp.float32)
        entry = (plan, table, coords_norm, boxes_float)
        if len(self._plan_cache) >= 128:
            self._plan_cache.pop(next(iter(self._plan_cache)))
        self._plan_cache[key] = entry
        return entry

    def detect(self, image: np.ndarray) -> DetectionResult:
        """Run the full pyramid cascade on one (H, W, 3) uint8 image."""
        return self.detect_batch([image])[0]

    def detect_batch(self, images: Sequence[np.ndarray]) -> List[DetectionResult]:
        """Detect over a list of images, optionally normalizing image sizes
        to configured buckets first.

        ``inference_resize_buckets`` (list of (h, w), or None): corpora with
        many distinct image sizes (e.g. FDDB) would compile one cascade
        program per size; bucketing resizes each image to its nearest bucket
        and maps detections back, trading exact pyramid geometry for a
        bounded number of compiled programs. None (default) keeps the
        reference's exact per-size geometry.
        """
        buckets = cf.get("inference_resize_buckets")
        if not buckets:
            return self._detect_batch_exact(images)

        from ..data.image_io import resize_rgb

        resized: List[np.ndarray] = []
        inverse_scales: List[Tuple[float, float]] = []
        for img in images:
            h, w = img.shape[0], img.shape[1]
            bh, bw = min(
                buckets,
                key=lambda b: abs(np.log(h / b[0])) + abs(np.log(w / b[1])),
            )
            if (bh, bw) == (h, w):
                resized.append(img)
                inverse_scales.append((1.0, 1.0))
            else:
                resized.append(resize_rgb(img, bh, bw))
                inverse_scales.append((w / bw, h / bh))

        results = self._detect_batch_exact(resized)
        for res, (sx, sy) in zip(results, inverse_scales):
            if sx != 1.0 or sy != 1.0:
                factors = np.array([sx, sy, sx, sy])
                res.boxes = res.boxes * factors
                res.raw_boxes = (res.raw_boxes * factors).astype(res.raw_boxes.dtype)
        return results

    def detect_batch_yuv420(self, frames: Sequence[Tuple[np.ndarray, np.ndarray]]):
        """Detect over YUV420 frames: each frame is (Y (H, W) uint8,
        UV (H/2, W/2, 2) uint8). Halves ingress bytes vs RGB24 — the natural
        serving format for video sources; chroma->RGB conversion fuses into
        the device program (ops/color.py)."""
        return self._detect_batch_exact(frames, yuv=True)

    def _detect_batch_exact(
        self, images: Sequence, yuv: bool = False
    ) -> List[DetectionResult]:
        """Detect over a list of images (the reference's merge mode,
        app/abstract_inference_app.py:38-106, without its host-side window
        merging: same-size frames are stacked through ONE batched device
        program per chunk; mixed sizes fall back to per-size grouping)."""
        max_frames = int(cf.get("inference_batch_frames"))
        results: List[Optional[DetectionResult]] = [None] * len(images)

        # group by image size so each group shares one pyramid plan
        by_size: Dict[Tuple[int, int], List[int]] = {}
        for i, img in enumerate(images):
            shape = img[0].shape if yuv else img.shape
            by_size.setdefault((shape[0], shape[1]), []).append(i)

        for (img_h, img_w), idxs in by_size.items():
            plan, table, coords_norm, boxes_float = self._plan_and_table(img_h, img_w)
            if plan.n_windows < 1:
                raise ValueError("Could not extract any windows from the given image")
            n_stages = self.model.n_nets
            capacities = tuple(
                self._capacity_override
                or default_capacity_schedule(plan.n_windows, n_stages)
            )
            thresholds = tuple(resolve_thresholds(n_stages))
            mode = cf.get("final_confidence_calculation")
            extraction_mode = resolve_extraction_mode(plan)
            # pure-device serving tail: clustering runs inside the program
            nms_on_device = bool(cf.get("nms_on_device")) and cf.get(
                "nms"
            ) == cf.NMS_OPENCV
            nms_mn = int(cf.get("nms_opencv_min_neighbors")) if nms_on_device else -1

            def make_common(caps, resample=None):
                return (
                    coords_norm,
                    boxes_float,
                    self._params_device,
                    self._stats_device,
                    plan,
                    tuple(self.model.stage_configs),
                    caps,
                    mode,
                    thresholds,
                    bool(cf.get("inference_high_precision")),
                    extraction_mode,
                    int(cf.get("inference_chunk_size")),
                    nms_mn,
                    resample or resolve_resample_impl(),
                    resolve_compaction(),
                    float(cf.get("nms_opencv_eps")),
                )

            # bounded software pipeline: keep `depth` chunks in flight so the
            # next chunk's upload/compute overlaps the current fetch, without
            # flooding HBM with queued executions
            depth = max(1, int(cf.get("inference_pipeline_depth")))
            pending = []
            done = []

            def dispatch(chunk):
                common = make_common(capacities)
                if yuv:
                    y_dev, _ = self._place_stack(
                        np.stack([images[i][0] for i in chunk])
                    )
                    uv_dev, _ = self._place_stack(
                        np.stack([images[i][1] for i in chunk])
                    )
                    packed = _cascade_infer_device_batch_yuv(y_dev, uv_dev, *common)
                else:
                    stack_dev, _ = self._place_stack(
                        np.stack([images[i] for i in chunk])
                    )
                    packed = _cascade_infer_device_batch(stack_dev, *common)
                pending.append((chunk, packed))

            chunks = [
                idxs[s : s + max_frames] for s in range(0, len(idxs), max_frames)
            ]
            for chunk in chunks:
                dispatch(chunk)
                if len(pending) > depth:
                    c, r = pending.pop(0)
                    done.append((c, np.asarray(r)))
            while pending:
                c, r = pending.pop(0)
                done.append((c, np.asarray(r)))

            for chunk, packed in done:
                for j, i in enumerate(chunk):
                    result = self._unpack_row(
                        packed[j], capacities, plan, table, nms_on_device, img_h
                    )
                    if self._is_saturated(
                        result.n_survivors_per_stage, capacities,
                        result.reextract_overflows,
                    ):
                        result = self._handle_saturation(
                            images[i], yuv, result, capacities, plan, table,
                            make_common, nms_on_device, img_h,
                        )
                    results[i] = result
        return results  # type: ignore[return-value]

    def _unpack_row(
        self, row, capacities, plan, table, nms_on_device, img_h
    ) -> DetectionResult:
        """Decode one image's packed result vector (see _pack_result).
        Delegates to the config-free decoder shared with the AOT serving
        path (serve.unpack_packed_row) so the two cannot drift."""
        from ..serve import unpack_packed_row

        return unpack_packed_row(
            row,
            capacities,
            self.model.n_nets,
            plan,
            table,
            nms_on_device,
            nms_mode=str(cf.get("nms")),
            nms_min_neighbors=int(cf.get("nms_opencv_min_neighbors")),
            nms_eps=float(cf.get("nms_opencv_eps")),
            vertically_enlarge=bool(cf.get("vertically_enlarge_bboxes")),
        )

    @staticmethod
    def _is_saturated(survivors, capacities, overflows=None) -> bool:
        """Truncation at compaction i happens exactly when the pre-compaction
        alive count exceeds the capacity (``survivors[i] > capacities[i]``);
        an exactly-filled buffer drops nothing. ``survivors[i]`` is counted
        *before* the next compaction (models/cascade._cascade_core), so the
        comparison is exact, not a heuristic. A dynamic-re-extract big-class
        overflow also counts as saturation: re-dispatch doubles the survivor
        caps, and the big cap (derived from them) doubles along."""
        if overflows and any(o > 0 for o in overflows):
            return True
        return any(s > c for s, c in zip(survivors, capacities))

    def _handle_saturation(
        self, frame, yuv, result, capacities, plan, table, make_common,
        nms_on_device, img_h,
    ) -> DetectionResult:
        """Saturation recovery: re-run the image through a program variant
        with doubled survivor capacities (bounded retries) so no detection is
        lost to truncation — preserving the reference's unbounded-survivor
        semantics (app/inference_cascade_app.py:217-240). Opt out with
        cascade_saturation_redispatch=False (keeps the round-1
        warn-and-truncate behavior)."""
        from ..utils import log

        def rerun(caps_, resample=None):
            common = make_common(tuple(caps_), resample)
            if yuv:
                y_dev, _ = self._place_stack(np.stack([frame[0]]))
                uv_dev, _ = self._place_stack(np.stack([frame[1]]))
                packed = _cascade_infer_device_batch_yuv(y_dev, uv_dev, *common)
            else:
                stack_dev, _ = self._place_stack(np.stack([frame]))
                packed = _cascade_infer_device_batch(stack_dev, *common)
            return self._unpack_row(
                np.asarray(packed)[0], tuple(caps_), plan, table,
                nms_on_device, img_h,
            )

        def overflowed(res) -> bool:
            return bool(
                res.reextract_overflows
                and any(o > 0 for o in res.reextract_overflows)
            )

        if not cf.get("cascade_saturation_redispatch"):
            # warn-and-truncate mode. Capacity truncation drops windows by
            # confidence rank — a semantic the user opted into — but a
            # dynamic-re-extract big-class overflow is NOT truncation: the
            # overflowed windows' pixels are garbage. That case always gets
            # one corrective re-run with the full-image resampler at the
            # SAME capacities (identical truncation semantics, correct
            # pixels) — never silent garbage.
            if overflowed(result):
                log.log(
                    "WARNING: dynamic re-extraction big class overflowed "
                    "(cascade_saturation_redispatch is off); re-running with "
                    "the full-image resampler at unchanged capacities."
                )
                result = rerun(list(capacities), resample="pallas")
            elif not self._saturation_warned:
                log.log(
                    "WARNING: a cascade stage saturated its survivor capacity; "
                    "excess windows were dropped by confidence ranking "
                    "(cascade_saturation_redispatch is off). Consider "
                    "retraining the stage or raising cascade_capacity_schedule."
                )
                self._saturation_warned = True
            return result

        caps = list(capacities)
        for _ in range(int(cf.get("cascade_saturation_max_retries"))):
            new_caps = escalate_capacities(caps, plan.n_windows)
            if new_caps is None:
                break  # survivor buffers fully open; nothing compaction-dropped
            caps = new_caps
            log.log(
                "WARNING: cascade stage saturated its survivor capacity; "
                "re-dispatching with capacities {} (a trained stage should "
                "reject most windows — consider retraining it or setting "
                "cascade_capacity_schedule to avoid the retry cost).".format(caps)
            )
            result = rerun(caps)
            if not self._is_saturated(
                result.n_survivors_per_stage, caps, result.reextract_overflows
            ):
                return result
        if overflowed(result):
            # the dynamic re-extract big class still overflowed after the
            # capacity escalation budget: one always-correct re-dispatch with
            # the v1 full-image resampler (never silent garbage)
            log.log(
                "WARNING: dynamic re-extraction big class overflowed; "
                "re-dispatching with the full-image resampler."
            )
            result = rerun(caps, resample="pallas")
        return result

    def _postprocess(self, boxes: np.ndarray, conf: np.ndarray):
        """NMS + optional vertical enlargement (app/inference_app.py:219-231).
        Delegates to the config-free shared implementation
        (serve.postprocess_raw) used by the serving decoder and the
        window-sharded path."""
        from ..serve import postprocess_raw

        return postprocess_raw(
            boxes,
            conf,
            nms_mode=str(cf.get("nms")),
            nms_min_neighbors=int(cf.get("nms_opencv_min_neighbors")),
            nms_eps=float(cf.get("nms_opencv_eps")),
            vertically_enlarge=bool(cf.get("vertically_enlarge_bboxes")),
        )


def build_cascade_model(
    seed: int = 0,
    n_nets: Optional[int] = None,
    img_size_max: Optional[int] = None,
) -> CascadeModel:
    """Randomly initialized cascade with config-driven architecture (useful
    for tests/benchmarks before training)."""
    n_nets = n_nets or cf.get("cascade_n_nets")
    img_size_max = img_size_max or cf.get("img_width")
    sizes = cnn.stage_input_sizes(
        n_nets, img_size_max, cf.get("cascade_increasing_input_dimensions")
    )
    key = jax.random.PRNGKey(seed)
    params_list, config_list, means, stds = [], [], [], []
    bneck = None
    for i, size in enumerate(sizes):
        sc = cnn.StageConfig.from_config(size, bottleneck_in_size=bneck)
        key, sub = jax.random.split(key)
        params_list.append(cnn.init_stage(sub, sc))
        config_list.append(sc)
        means.append(np.full((size, size, 3), 127.5, np.float32))
        stds.append(np.full((size, size, 3), 64.0, np.float32))
        bneck = sc.bottleneck_out_size if cf.get("reuse_bottlenecks") else None
    return CascadeModel(params_list, config_list, means, stds)
