"""Single-net sliding-window detector (no cascade).

The reference's ``InferenceApp`` path (app/inference_app.py:117-154): extract
the full pyramid at the net's input resolution, classify every window with
one CNN, keep windows whose argmax is foreground (confidence = max softmax),
then NMS. Here the extraction + CNN + argmax run as one jitted program per
image-size bucket, with the same batched-frames packing as the cascade.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as cf
from ..ops import nms as nms_ops
from ..ops import rectangles as rect_ops
from ..ops.pyramid import PyramidPlan, build_plan, window_table
from . import cnn
from .cascade import (
    DetectionResult,
    _stage0_apply,
    _stage0_schedule,
    resolve_extraction_mode,
    resolve_resample_impl,
)


@functools.partial(
    jax.jit,
    static_argnames=(
        "plan",
        "stage_config",
        "extraction_mode",
        "chunk",
        "resample_impl",
    ),
)
def _single_infer_batch(
    images: jnp.ndarray,
    stage_params: cnn.Params,
    mean: jnp.ndarray,
    std: jnp.ndarray,
    boxes_float: jnp.ndarray,
    plan: PyramidPlan,
    stage_config: cnn.StageConfig,
    extraction_mode: str,
    chunk: int,
    resample_impl: str,
):
    """(B, H, W, C) -> packed (B, 2*M) float32: [fg_mask (M), confidence (M)].

    Shares the cascade's dense stage-0 machinery (models/cascade._stage0_apply)
    so the single net scales to FDDB-density pyramids: chunked window
    application bounds the conv intermediates, and on TPU the scheduled
    support-bounded Pallas extraction kernel runs when the plan admits a
    schedule. M == plan.n_windows for the unscheduled paths; the scheduled
    kernel emits rows in scheduled order with replicated pads (M >= N) —
    the host maps rows back via the (static, host-known) schedule ids.
    """

    def one(image):
        probs, _bneck, _ids, valid = _stage0_apply(
            image.astype(jnp.float32),
            boxes_float,
            plan,
            stage_params,
            stage_config,
            mean,
            std,
            chunk,
            extraction_mode,
            resample_impl,
            False,
        )
        fg = jnp.argmax(probs, axis=1) == 1
        if valid is not None:
            fg = fg & valid
        conf = jnp.max(probs, axis=1)
        return jnp.concatenate([fg.astype(jnp.float32), conf])

    return jax.vmap(one)(images)


class SingleNetDetector:
    """Full-image detection with one trained stage CNN."""

    def __init__(
        self,
        params: cnn.Params,
        stage_config: cnn.StageConfig,
        mean: np.ndarray,
        std: np.ndarray,
    ):
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.stage_config = stage_config
        self.mean = jnp.asarray(mean)
        self.std = jnp.asarray(std)
        self._plan_cache: Dict[tuple, tuple] = {}

    # config-keyed per-instance cache (NOT functools.lru_cache on (h, w):
    # that would silently serve stale pyramid geometry when
    # min_window_length / window_scale_factor change between detects —
    # EvaluateFDDBApp and the runtime sweeps mutate exactly these keys)
    def _plan_and_table(self, img_h: int, img_w: int):
        size = self.stage_config.input_size
        mwl = float(cf.get("min_window_length"))
        wsf = float(cf.get("window_scale_factor"))
        key = (img_h, img_w, size, mwl, wsf)
        cached = self._plan_cache.get(key)
        if cached is None:
            plan = build_plan(img_h, img_w, size, size, mwl, wsf)
            cached = (plan, window_table(plan))
            if len(self._plan_cache) >= 128:
                self._plan_cache.pop(next(iter(self._plan_cache)))
            self._plan_cache[key] = cached
        return cached

    def detect(self, image: np.ndarray) -> DetectionResult:
        return self.detect_batch([image])[0]

    def detect_batch(self, images: Sequence[np.ndarray]) -> List[DetectionResult]:
        max_frames = int(cf.get("inference_batch_frames"))
        results: List[Optional[DetectionResult]] = [None] * len(images)
        by_size: Dict[Tuple[int, int], List[int]] = {}
        for i, img in enumerate(images):
            by_size.setdefault((img.shape[0], img.shape[1]), []).append(i)

        for (img_h, img_w), idxs in by_size.items():
            plan, table = self._plan_and_table(img_h, img_w)
            if plan.n_windows < 1:
                raise ValueError("Could not extract any windows from the given image")
            n = plan.n_windows
            extraction_mode = resolve_extraction_mode(plan)
            resample_impl = resolve_resample_impl()
            window_chunk = int(cf.get("inference_chunk_size"))
            boxes_float = jnp.asarray(table["boxes_float"])
            # scheduled stage-0 rows come back in scheduled order with
            # replicated pads; ids map them to plan window order (the same
            # static schedule the traced program consumed)
            sched = None
            if extraction_mode == "crop":
                sched = _stage0_schedule(
                    plan, self.stage_config.input_size, resample_impl, False
                )

            def dispatch(chunk_idxs):
                stack = np.stack([images[i] for i in chunk_idxs])
                return _single_infer_batch(
                    jnp.asarray(stack),
                    self.params,
                    self.mean,
                    self.std,
                    boxes_float,
                    plan,
                    self.stage_config,
                    extraction_mode,
                    window_chunk,
                    resample_impl,
                )

            # bounded software pipeline (same scheme as the cascade's
            # detect_batch): keep `depth` frame chunks in flight so the next
            # chunk's upload/compute overlaps the current fetch
            depth = max(1, int(cf.get("inference_pipeline_depth")))
            chunks = [
                idxs[s : s + max_frames] for s in range(0, len(idxs), max_frames)
            ]
            pending = []
            done = []
            for chunk_idxs in chunks:
                pending.append((chunk_idxs, dispatch(chunk_idxs)))
                if len(pending) > depth:
                    c, r = pending.pop(0)
                    done.append((c, np.asarray(r)))
            while pending:
                c, r = pending.pop(0)
                done.append((c, np.asarray(r)))

            for chunk_idxs, packed in done:
                for j, i in enumerate(chunk_idxs):
                    results[i] = self._unpack_row(packed[j], plan, table, sched)
        return results  # type: ignore[return-value]

    @staticmethod
    def _unpack_row(row: np.ndarray, plan, table, sched) -> DetectionResult:
        """Decode one frame's packed [fg_mask (M), confidence (M)] vector:
        map scheduled row order back to plan window order when the scheduled
        kernel ran, then threshold + NMS on the host."""
        n = plan.n_windows
        m = row.shape[0] // 2
        fg_rows = row[:m] > 0.5
        conf_rows = row[m:]
        if sched is not None:
            fg = np.zeros(n, bool)
            conf = np.zeros(n, np.float32)
            fg[sched.ids[sched.valid]] = fg_rows[sched.valid]
            conf[sched.ids[sched.valid]] = conf_rows[sched.valid]
        else:
            fg, conf = fg_rows, conf_rows
        raw_boxes = table["coords_norm"][fg]
        raw_conf = conf[fg]
        boxes, confs = _postprocess(raw_boxes, raw_conf)
        return DetectionResult(
            boxes=boxes,
            confidences=confs,
            raw_boxes=raw_boxes,
            raw_confidences=raw_conf,
            n_windows=n,
            n_survivors_per_stage=[int(fg.sum())],
        )

    def classify_patches(self, patches: np.ndarray) -> np.ndarray:
        """Foreground probabilities for pre-extracted fixed-size patches
        (the reference's ``run_inference_on_raw_data``,
        app/inference_app.py:156-166). Also used as the dataset
        background-filter callable (data/loader.py)."""
        x = (jnp.asarray(patches).astype(jnp.float32) - self.mean) / self.std
        out = cnn.apply_stage(self.params, self.stage_config, x)
        return np.asarray(out["probs"][:, 1])


def _postprocess(boxes: np.ndarray, conf: np.ndarray):
    if len(boxes) == 0:
        return np.zeros((0, 4), np.float64), np.zeros((0,), np.float64)
    if cf.get("nms") == cf.NMS_OPENCV:
        out_boxes, weights = nms_ops.nms_boxes(
            boxes, cf.get("nms_opencv_min_neighbors"),
            float(cf.get("nms_opencv_eps")),
        )
        out_boxes = out_boxes.astype(np.float64)
        out_conf = weights.astype(np.float64)
    else:
        out_boxes = boxes.astype(np.float64)
        out_conf = conf.astype(np.float64)
    if cf.get("vertically_enlarge_bboxes") and len(out_boxes):
        out_boxes = rect_ops.vertically_enlarge(out_boxes, enlarge_top=0.2)
    return out_boxes, out_conf
