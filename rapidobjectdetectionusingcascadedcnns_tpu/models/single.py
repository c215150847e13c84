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
from ..ops.windows import extract_windows
from . import cnn
from .cascade import DetectionResult


@functools.partial(jax.jit, static_argnames=("plan", "stage_config"))
def _single_infer_batch(
    images: jnp.ndarray,
    stage_params: cnn.Params,
    mean: jnp.ndarray,
    std: jnp.ndarray,
    plan: PyramidPlan,
    stage_config: cnn.StageConfig,
):
    """(B, H, W, C) -> packed (B, 2*N) float32: [fg_mask (N), confidence (N)]."""

    def one(image):
        windows = extract_windows(image.astype(jnp.float32), plan)
        x = (windows - mean) / std
        out = cnn.apply_stage(stage_params, stage_config, x)
        best = jnp.argmax(out["logits"], axis=1)
        conf = jnp.max(out["probs"], axis=1)
        return jnp.concatenate([(best == 1).astype(jnp.float32), conf])

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

    @functools.lru_cache(maxsize=128)
    def _plan_and_table(self, img_h: int, img_w: int):
        size = self.stage_config.input_size
        plan = build_plan(
            img_h,
            img_w,
            size,
            size,
            cf.get("min_window_length"),
            cf.get("window_scale_factor"),
        )
        return plan, window_table(plan)

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
            for s in range(0, len(idxs), max_frames):
                chunk = idxs[s : s + max_frames]
                stack = np.stack([images[i] for i in chunk])
                packed = np.asarray(
                    _single_infer_batch(
                        jnp.asarray(stack),
                        self.params,
                        self.mean,
                        self.std,
                        plan,
                        self.stage_config,
                    )
                )
                for j, i in enumerate(chunk):
                    fg = packed[j, :n] > 0.5
                    conf = packed[j, n:]
                    raw_boxes = table["coords_norm"][fg]
                    raw_conf = conf[fg]
                    boxes, confs = _postprocess(raw_boxes, raw_conf)
                    results[i] = DetectionResult(
                        boxes=boxes,
                        confidences=confs,
                        raw_boxes=raw_boxes,
                        raw_confidences=raw_conf,
                        n_windows=n,
                        n_survivors_per_stage=[int(fg.sum())],
                    )
        return results  # type: ignore[return-value]

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
        out_boxes, weights = nms_ops.nms_boxes(boxes, cf.get("nms_opencv_min_neighbors"))
        out_boxes = out_boxes.astype(np.float64)
        out_conf = weights.astype(np.float64)
    else:
        out_boxes = boxes.astype(np.float64)
        out_conf = conf.astype(np.float64)
    if cf.get("vertically_enlarge_bboxes") and len(out_boxes):
        out_boxes = rect_ops.vertically_enlarge(out_boxes, enlarge_top=0.2)
    return out_boxes, out_conf
