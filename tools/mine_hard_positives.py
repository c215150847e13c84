"""Mine hard-POSITIVE samples from the trained flagship's missed faces.

The recorded miss set is model-limited, not geometric
(artifacts/flagship_eval.json: misses_grid_limited == 0, and most misses
have a SURVIVING raw window at IoU >= 0.65 that the cascade scored below
threshold) — so the boosting machinery runs in reverse (VERDICT r3 item 2):
run the CURRENT flagship over freshly generated scenes (seeds disjoint from
the training corpus, the benchmark eval 100..199, and the hard-negative
mining pool 5000+), find every ground-truth face with no detection at
IoU >= 0.5, and keep two crops per miss:

  * the ground-truth face box itself (what the model should score high), and
  * its best-IoU pyramid window box when one exists (the EXACT geometry the
    sliding-window grid will present at inference — off-center/scale jitter
    the procedural positives under-represent).

Re-rendered at the cascade's aligned stage resolutions, these become extra
foreground samples for the next training round
(SyntheticProvider(hard_positives=...)). Mirrors the reference's
detector-steered sampling design in reverse
(/root/reference/app/sampling_app.py + train_cascade_app.py:137-173 intent).

Writes artifacts/hard_positives.npz  {"images": (N, 48, 48, 3) u8, meta...}

Usage: python tools/mine_hard_positives.py [n_scenes] [threshold]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MINE_SEED0 = 20000  # disjoint: train <5000, eval 100..199, hard-neg 5000+
IOU_DETECTED = 0.5  # a GT face with no detection above this is a miss


def mine(model, n_scenes=400, seed0=MINE_SEED0, threshold=0.5):
    from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
    from rapidobjectdetectionusingcascadedcnns_tpu.data import synthetic
    from rapidobjectdetectionusingcascadedcnns_tpu.data.image_io import resize_rgb
    from rapidobjectdetectionusingcascadedcnns_tpu.models import cascade as casc
    from rapidobjectdetectionusingcascadedcnns_tpu.ops import rectangles as rect_ops
    from rapidobjectdetectionusingcascadedcnns_tpu.ops.pyramid import (
        build_plan,
        window_table,
    )

    cf.set("window_scale_factor", 1.1)
    cf.set("min_window_length", 0.075)
    cf.set("foreground_confidence_threshold", threshold)
    cf.set("nms", cf.NMS_OPENCV)
    cf.set("nms_opencv_min_neighbors", 1)

    top = max(model.input_sizes)
    detector = casc.CascadeDetector(model)
    grid = None  # all pyramid window boxes (static per image size)
    patches = []
    n_missed = 0
    batch = 25
    for start in range(0, n_scenes, batch):
        scenes = [
            synthetic.make_scene(
                480, 640, n_faces=3, seed=seed0 + s, min_face=48, max_face=120
            )
            for s in range(start, min(start + batch, n_scenes))
        ]
        results = detector.detect_batch([s.image for s in scenes])
        if grid is None:
            plan = build_plan(480, 640, model.input_sizes[0],
                              model.input_sizes[0], 0.075, 1.1)
            grid = window_table(plan)["coords_norm"].astype(np.float64)
        for scene, res in zip(scenes, results):
            gt = scene.boxes.astype(np.float64)
            if not len(gt):
                continue
            det = res.boxes.astype(np.float64)
            det_iou = (
                rect_ops.iou_matrix(det, gt).max(axis=0)
                if len(det)
                else np.zeros(len(gt))
            )
            h, w = scene.image.shape[:2]
            for gi in np.nonzero(det_iou < IOU_DETECTED)[0]:
                n_missed += 1
                crops = [gt[gi]]
                # best-IoU pyramid window: the grid geometry the model
                # actually failed on
                win_iou = rect_ops.iou_matrix(grid, gt[gi : gi + 1])[:, 0]
                best = int(np.argmax(win_iou))
                if win_iou[best] >= 0.5:
                    crops.append(grid[best])
                # scale/shift jitters of the GT box (VERDICT r4 #3): the
                # stage-0-blind misses are appearance modes no aligned crop
                # represents — present each missed face at the off-center /
                # off-scale geometries the sliding grid will actually show
                x0g, y0g, x1g, y1g = gt[gi]
                cw, ch = x1g - x0g, y1g - y0g
                cx, cy = (x0g + x1g) / 2.0, (y0g + y1g) / 2.0
                for scale, dx, dy in (
                    (0.85, 0.0, 0.0),
                    (1.15, 0.0, 0.0),
                    (1.0, 0.12, 0.0),
                    (1.0, 0.0, 0.12),
                ):
                    half_w = cw * scale / 2.0
                    half_h = ch * scale / 2.0
                    jx, jy = cx + dx * cw, cy + dy * ch
                    crops.append(
                        np.array(
                            [jx - half_w, jy - half_h, jx + half_w, jy + half_h]
                        )
                    )
                for box in crops:
                    x0, y0, x1, y1 = [int(round(v)) for v in box]
                    x0, y0 = max(x0, 0), max(y0, 0)
                    x1, y1 = min(x1, w), min(y1, h)
                    if x1 - x0 < 8 or y1 - y0 < 8:
                        continue
                    patches.append(
                        resize_rgb(scene.image[y0:y1, x0:x1], top, top)
                    )
        print(
            f"scenes {start}..{start + len(scenes)}: {n_missed} missed faces, "
            f"{len(patches)} crops mined",
            flush=True,
        )
    images = (
        np.stack(patches) if patches else np.zeros((0, top, top, 3), np.uint8)
    )
    return images, n_missed


def main():
    import jax

    cache_dir = os.environ.get("RODC_JIT_CACHE", "/tmp/rodc_jit_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import train_flagship as tf_mod

    n_scenes = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    model = tf_mod.load_flagship()
    if model is None:
        raise SystemExit("no flagship artifact — run tools/train_flagship.py")
    from rapidobjectdetectionusingcascadedcnns_tpu import config as cf

    tf_mod.flagship_config(cf)
    tf_mod.apply_recorded_overrides(cf)
    quality = tf_mod.load_flagship_quality()
    threshold = float(quality["threshold"]) if quality else 0.5
    images, n_missed = mine(model, n_scenes=n_scenes, threshold=threshold)
    path = os.path.join(tf_mod.ARTIFACT_DIR, "hard_positives.npz")
    np.savez_compressed(
        path,
        images=images,
        meta=json.dumps(
            {
                "n_scenes": n_scenes,
                "seed0": MINE_SEED0,
                "threshold": threshold,
                "iou_detected": IOU_DETECTED,
                "n_missed_faces": int(n_missed),
                "n_mined": int(len(images)),
            }
        ),
    )
    print(f"saved {len(images)} hard positives ({n_missed} missed faces) to {path}")


if __name__ == "__main__":
    main()
