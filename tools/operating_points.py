"""Operating-point grid for the trained flagship cascade.

The reference's FDDB evaluation emits a detection-rate *curve*
(/root/reference/app/evaluate_fddb_app.py:171-179), and its inference knobs
are the per-stage foreground confidence threshold
(/root/reference/config.py `foreground_confidence_threshold`) and the
groupRectangles min-neighbors count
(/root/reference/app/inference_cascade_app.py NMS call). This tool sweeps
both on the cached flagship artifact (no retraining) over the 100-scene
benchmark eval and records every point, so the headline quality number is a
chosen point on a measured curve rather than a lone sample.

Writes artifacts/flagship_operating_points.json.

Usage: python tools/operating_points.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

THRESHOLDS = (0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)
# mn=0 keeps singleton clusters (groupRectangles count > 0) — round 5's
# stage-of-death probes showed 9/10 misses at the old shipped point were
# full-cascade SURVIVORS whose 1-2 windows could not meet the >=2-member
# bar, so the mn=0 column is where the recall headroom lives
MIN_NEIGHBORS = (0, 1, 2)


def main():
    import jax

    cache_dir = os.environ.get("RODC_JIT_CACHE", "/tmp/rodc_jit_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import train_flagship as tf_mod

    model = tf_mod.load_flagship()
    if model is None:
        raise SystemExit("no flagship artifact — run tools/train_flagship.py")
    from rapidobjectdetectionusingcascadedcnns_tpu import config as cf

    tf_mod.flagship_config(cf)
    tf_mod.apply_recorded_overrides(cf)

    points = []
    for mn in MIN_NEIGHBORS:
        for thr in THRESHOLDS:
            stats = tf_mod.evaluate_on_scenes(
                model, threshold=thr, miss_analysis=False, min_neighbors=mn
            )
            points.append(stats)
            print(json.dumps(stats), flush=True)

    # headline point: best recall among points with fp/scene <= 0.5,
    # tie-broken by lower fp
    feasible = [p for p in points if p["false_pos_per_scene"] <= 0.5]
    headline = max(
        feasible, key=lambda p: (p["recall"], -p["false_pos_per_scene"])
    ) if feasible else None
    out = {"points": points, "headline": headline}
    path = os.path.join(tf_mod.ARTIFACT_DIR, "flagship_operating_points.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("headline:", json.dumps(headline))


if __name__ == "__main__":
    main()
