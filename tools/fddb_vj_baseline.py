"""FDDB-style score for the Viola-Jones baseline — the reference's headline
comparison (cascaded CNNs vs the OpenCV VJ detector, README.md motivation +
app/inference_ocv_app.py) reproduced end to end on the synthetic corpus.

Runs the in-repo VJ evaluator (ops/viola_jones.py) with the pretrained
frontal-face model over the same synthetic 10-fold FDDB corpus the cascade
ROC uses (same generator seed), exports official detection-format folds,
scores them with the in-repo ellipse scorer, and writes
artifacts/fddb_vj_baseline.json with the cascade's numbers alongside.

Usage: python tools/fddb_vj_baseline.py [--imgs-per-fold 12]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ARTIFACT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts"
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--imgs-per-fold", type=int, default=12)
    ap.add_argument("--scale-factor", type=float, default=1.1)
    ap.add_argument("--min-neighbors", type=int, default=1)
    args = ap.parse_args()

    from PIL import Image

    from rapidobjectdetectionusingcascadedcnns_tpu.data import fddb, fddb_eval
    from rapidobjectdetectionusingcascadedcnns_tpu.ops import viola_jones as vj

    xml = vj.default_cascade_path()
    if xml is None:
        raise SystemExit("no pretrained haar XML findable")
    cascade = vj.parse_cascade_xml(xml)

    work = tempfile.mkdtemp(prefix="fddb_vj_")
    img_base, folds_dir, _truth = fddb.make_synthetic_corpus(
        work, n_folds=10, imgs_per_fold=args.imgs_per_fold, seed=7
    )
    export_dir = os.path.join(work, "out")

    t0 = time.time()
    n_images = 0
    for fold_nr in range(1, 11):
        keys = fddb.read_fold_keys_from(folds_dir, fold_nr)
        boxes_per = []
        confs_per = []
        for key in keys:
            img = np.asarray(Image.open(os.path.join(img_base, key + ".jpg")))
            gray = vj.rgb_to_gray_u8(img)
            rects, weights = vj.detect_multi_scale(
                cascade,
                gray,
                scale_factor=args.scale_factor,
                min_neighbors=args.min_neighbors,
                return_weights=True,
            )
            if len(rects):
                xyxy = np.stack(
                    [
                        rects[:, 0],
                        rects[:, 1],
                        rects[:, 0] + rects[:, 2],
                        rects[:, 1] + rects[:, 3],
                    ],
                    axis=1,
                ).astype(np.float64)
            else:
                xyxy = np.zeros((0, 4), np.float64)
            boxes_per.append(xyxy)
            confs_per.append(weights.astype(np.float64))
            n_images += 1
        fddb.write_fold_results(export_dir, fold_nr, keys, boxes_per, confs_per)
    wall = time.time() - t0

    result = fddb_eval.evaluate_folds(export_dir, folds_dir, 10)
    out = {
        "detector": "viola_jones_in_repo",
        "model_xml": xml,
        "scale_factor": args.scale_factor,
        "min_neighbors": args.min_neighbors,
        "n_images": n_images,
        "wall_secs": round(wall, 1),
        "n_faces": result["n_faces"],
        "n_detections": result["n_detections"],
        "roc": result["roc"],
        "corpus": "synthetic (data/fddb.make_synthetic_corpus seed=7; same "
                  "generator as artifacts/fddb_roc.json)",
    }
    # put the cascade's recorded curve alongside for the comparison table —
    # the BEST recorded curve (the tuned/bucketed and reference-default
    # artifacts cover different configs; the comparison is cascade-best vs
    # VJ, like the reference's README claim)
    best = None
    for name in ("fddb_roc.json", "fddb_roc_default.json"):
        p = os.path.join(ARTIFACT_DIR, name)
        if not os.path.exists(p):
            continue
        with open(p) as f:
            cr = json.load(f)
        if cr.get("roc"):
            cand = {
                "n_faces": cr["n_faces"],
                "tail": cr["roc"][-1],
                "source_artifact": name,
            }
            if best is None or (
                cand["tail"]["detection_rate"] > best["tail"]["detection_rate"]
            ):
                best = cand
    if best is not None:
        out["cascade_comparison"] = best
    os.makedirs(ARTIFACT_DIR, exist_ok=True)
    dst = os.path.join(ARTIFACT_DIR, "fddb_vj_baseline.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    tail = result["roc"][-1] if result["roc"] else None
    print(json.dumps({
        "n_faces": result["n_faces"],
        "n_detections": result["n_detections"],
        "vj_tail": tail,
        "wall_secs": out["wall_secs"],
        "artifact": dst,
    }))


if __name__ == "__main__":
    main()
