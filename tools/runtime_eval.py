"""Produce artifacts/runtime_eval.json: the reference's core experiment
table — {cascade, single} x {accelerator, host CPU} runtime — via
EvaluateRuntimeApp with compare_platforms (verdict r2 item 8).

The reference could only fill half its table (TF could not switch devices
after init, app/evaluate_runtime_app.py:52-54); here the backend re-inits
per platform, so all four cells get measured numbers.

The cascade runs the TRAINED flagship (realistic survivor counts); the
single net is the same final-resolution architecture (48px, conv [32],
fc1 512) with fresh init — single-net runtime is weight-independent (the
program classifies every pyramid window regardless of scores).

Usage: python tools/runtime_eval.py [--n-pos 16] [--n-neg 4]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pos", type=int, default=16)
    ap.add_argument("--n-neg", type=int, default=4)
    args = ap.parse_args()

    import jax

    cache_dir = os.environ.get("RODC_JIT_CACHE", "/tmp/rodc_jit_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    import train_flagship

    from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
    from rapidobjectdetectionusingcascadedcnns_tpu.models import cnn
    from rapidobjectdetectionusingcascadedcnns_tpu.models.single import (
        SingleNetDetector,
    )
    from rapidobjectdetectionusingcascadedcnns_tpu.utils import device, log

    log.set_echo(True)
    # the platform REGISTRATION name (what jax_platforms accepts), not the
    # device's .platform attribute: this image's tunneled TPU registers as
    # 'axon' while its devices report 'tpu'
    accel = jax.config.jax_platforms or device.current_platform()

    model = train_flagship.load_flagship()
    weights = "trained"
    if model is None:
        from rapidobjectdetectionusingcascadedcnns_tpu.models import cascade as casc

        train_flagship.flagship_config(cf)
        model = casc.build_cascade_model(seed=0)
        weights = "random"
    else:
        train_flagship.flagship_config(cf)

    # benchmark inference geometry (reference defaults)
    cf.set("window_scale_factor", 1.1)
    cf.set("min_window_length", 0.075)
    cf.set("foreground_confidence_threshold", 0.5)
    cf.set("nms", cf.NMS_OPENCV)
    cf.set("nms_opencv_min_neighbors", 1)
    cf.set("dataset_keys", ["synthetic"])
    cf.set("inference_merge", True)

    # single net: final-resolution architecture, no bottleneck input
    scfg = cnn.StageConfig.from_config(48, bottleneck_in_size=None)
    sparams = cnn.init_stage(jax.random.PRNGKey(0), scfg)
    single = SingleNetDetector(
        sparams,
        scfg,
        np.full((48, 48, 3), 127.5, np.float32),
        np.full((48, 48, 3), 64.0, np.float32),
    )

    from rapidobjectdetectionusingcascadedcnns_tpu.apps.evaluate_runtime import (
        EvaluateRuntimeApp,
    )

    t0 = time.time()
    app = EvaluateRuntimeApp(
        n_positive=args.n_pos,
        n_negative=args.n_neg,
        cascade_model=model,
        single_detector=single,
        compare_platforms=[accel, "cpu"],
    )
    wall = time.time() - t0

    payload = {
        "experiment": "runtime cascade-vs-single x platform "
                      "(reference app/evaluate_runtime_app.py:50-97)",
        "n_images": args.n_pos + args.n_neg,
        "image_size": [480, 640],
        "window_scale_factor": 1.1,
        "cascade_weights": weights,
        "platforms": [accel, "cpu"],
        "results": {
            k: ({kk: round(vv, 4) for kk, vv in v.items()})
            for k, v in app.results.items()
        },
        "wall_secs": round(wall, 1),
        "note": "single-net runtime is weight-independent (classifies every "
                "pyramid window); cascade uses the trained flagship so "
                "survivor counts are realistic. 'cpu' is this VM's single "
                "pathologically-slow core (NOTES.md) — treat it as a lower "
                "bound, the shape of the table is the point.",
    }
    os.makedirs(ARTIFACT_DIR, exist_ok=True)
    path = os.path.join(ARTIFACT_DIR, "runtime_eval.json")
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    print("wrote", path)
    print(json.dumps(payload["results"], indent=1))


if __name__ == "__main__":
    main()
