"""Quantify the detection-rate cost of FDDB resize bucketing.

The FDDB harness defaults to resize buckets (config fddb_resize_buckets) to
bound compiled-program count across FDDB's many image sizes, trading exact
pyramid geometry (the reference evaluates at per-image geometry with
window_scale_factor 1.005) for compile time. This tool measures that trade on
the synthetic FDDB-format corpus with the trained flagship cascade:

  * runs the full-density (1.005) detection with EXACT per-size geometry and
    with the default buckets;
  * scores both against the corpus ground truth (IoU-matched recall +
    false positives per image);
  * records the delta in artifacts/bucketing_delta.json.

Usage: python tools/fddb_bucketing_delta.py [--scale 1.005] [--folds 4]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARTIFACT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts"
)


def score(results_by_key, truth, iou_thr=0.3):
    from rapidobjectdetectionusingcascadedcnns_tpu.ops import rectangles as R

    tp = fn = fp = 0
    for key, gt_boxes in truth.items():
        boxes = results_by_key.get(key)
        matched = set()
        for gt in gt_boxes:
            hit = False
            for k, box in enumerate(boxes):
                if R.iou_single(gt, box) > iou_thr:
                    hit = True
                    matched.add(k)
            tp += int(hit)
            fn += int(not hit)
        fp += len(boxes) - len(matched)
    n_img = len(truth)
    return {
        "recall": round(tp / max(tp + fn, 1), 4),
        "false_pos_per_img": round(fp / max(n_img, 1), 2),
        "n_faces": tp + fn,
        "n_images": n_img,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.005)
    ap.add_argument("--folds", type=int, default=4)
    args = ap.parse_args()

    import jax

    cache_dir = os.environ.get("RODC_JIT_CACHE", "/tmp/rodc_jit_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np
    from PIL import Image

    from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
    from rapidobjectdetectionusingcascadedcnns_tpu.data import fddb
    from rapidobjectdetectionusingcascadedcnns_tpu.models import cascade as casc
    from rapidobjectdetectionusingcascadedcnns_tpu.utils import log

    log.set_echo(True)
    import train_flagship

    model = train_flagship.load_flagship()
    if model is None:
        print("train the flagship first: python tools/train_flagship.py")
        return
    train_flagship.flagship_config(cf)

    corpus_dir = os.path.join(ARTIFACT_DIR, "fddb_synth")
    img_base, folds_dir, truth = fddb.make_synthetic_corpus(
        corpus_dir, n_folds=args.folds, imgs_per_fold=2, seed=7
    )
    cf.set("fddb_folds_dir", folds_dir)
    cf.set("fddb_img_base_dir", img_base)

    cf.set("window_scale_factor", args.scale)
    cf.set("vertically_enlarge_bboxes", False)  # score plain boxes vs GT boxes
    cf.set("foreground_confidence_threshold", 0.5)
    cf.set("nms", cf.NMS_OPENCV)
    cf.set("nms_opencv_min_neighbors", 1)

    detector = casc.CascadeDetector(model)
    images = {}
    for fold_nr in range(1, args.folds + 1):
        for key in fddb.read_fold(fold_nr):
            images[key] = np.asarray(
                Image.open(os.path.join(img_base, key + ".jpg")).convert("RGB")
            )

    out = {"scale": args.scale, "n_images": len(images)}
    for mode, buckets in (
        ("exact", None),
        ("bucketed", cf.get("fddb_resize_buckets")),
    ):
        cf.set("inference_resize_buckets", buckets)
        t0 = time.time()
        keys = list(images.keys())
        results = detector.detect_batch([images[k] for k in keys])
        secs = time.time() - t0
        by_key = {k: r.boxes for k, r in zip(keys, results)}
        out[mode] = score(by_key, truth)
        out[mode]["seconds"] = round(secs, 1)
        print(mode, out[mode], flush=True)

    out["recall_delta"] = round(out["bucketed"]["recall"] - out["exact"]["recall"], 4)
    os.makedirs(ARTIFACT_DIR, exist_ok=True)
    with open(os.path.join(ARTIFACT_DIR, "bucketing_delta.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
