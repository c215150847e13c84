"""Validate the AOT serving bundle on real hardware with the flagship.

Exports the trained flagship's VGA YUV cascade program to a bundle, saves and
reloads it, and checks on the live backend that: (1) detections are identical
to the live CascadeDetector on 32 synthetic scenes, (2) the bundle serves at
the same staged rate as the live program. Records artifacts/serving_check.json.

Usage: python tools/serve_bundle_check.py
"""

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache_dir = os.environ.get("RODC_JIT_CACHE", "/tmp/rodc_jit_cache")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from rapidobjectdetectionusingcascadedcnns_tpu import config as cf, serve
from rapidobjectdetectionusingcascadedcnns_tpu.data import synthetic
from rapidobjectdetectionusingcascadedcnns_tpu.models import cascade as casc
from rapidobjectdetectionusingcascadedcnns_tpu.ops.color import rgb_to_yuv420

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)
import train_flagship


def main():
    cf.reset()
    model = train_flagship.load_flagship()
    with open(os.path.join(train_flagship.ARTIFACT_DIR, "flagship_eval.json")) as f:
        quality = json.load(f)
    cf.set("foreground_confidence_threshold", float(quality["threshold"]))
    if quality.get("min_neighbors") is not None:
        # shipped operating point carries both knobs (round 5: mn=0)
        cf.set("nms_opencv_min_neighbors", int(quality["min_neighbors"]))
    cf.set("nms_on_device", True)
    caps = train_flagship.capacity_schedule_from_quality(quality)
    n_scenes = 32
    frames = [
        rgb_to_yuv420(
            synthetic.make_scene(
                480, 640, n_faces=3, seed=s, min_face=48, max_face=120
            ).image
        )
        for s in range(n_scenes)
    ]

    det = casc.CascadeDetector(model, capacity_schedule=caps)
    live = det.detect_batch_yuv420(frames)

    t0 = time.perf_counter()
    bundle = serve.export_detector(
        model, 480, 640, batch=16, yuv=True, capacities=caps, n_rungs=3,
        resample_impl="xla",
    )
    export_s = time.perf_counter() - t0
    with tempfile.TemporaryDirectory() as d:
        serve.save_bundle(bundle, d)
        blob_bytes = sum(
            os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
        )
        t0 = time.perf_counter()
        served_det = serve.load_bundle(d)
        load_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        served = served_det.detect_batch(frames)
        first_call_s = time.perf_counter() - t0

        mismatches = 0
        for a, b in zip(live, served):
            if not (
                np.array_equal(a.raw_window_ids, b.raw_window_ids)
                and np.allclose(a.boxes, b.boxes, atol=1e-5)
            ):
                mismatches += 1

        # steady-state staged rate through the bundle
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = served_det.detect_batch(frames)
            rates.append(n_scenes / (time.perf_counter() - t0))

    # dynamic-batch variant: symbolic batch dim, single-rung, 5 frames
    dyn_bundle = serve.export_detector(
        model, 480, 640, batch="dynamic", yuv=True, capacities=caps, n_rungs=1,
        resample_impl="xla",
    )
    with tempfile.TemporaryDirectory() as d:
        serve.save_bundle(dyn_bundle, d)
        dyn_det = serve.load_bundle(d)
        dyn = dyn_det.detect_batch(frames[:5])
    dyn_mismatches = sum(
        0
        if np.array_equal(a.raw_window_ids, b.raw_window_ids)
        and np.allclose(a.boxes, b.boxes, atol=1e-5)
        else 1
        for a, b in zip(live[:5], dyn)
    )

    out = {
        "platform": jax.default_backend(),
        "n_scenes": n_scenes,
        "capacity_rungs": bundle.meta["capacity_rungs"],
        "bundle_bytes": blob_bytes,
        "export_s": round(export_s, 2),
        "load_s": round(load_s, 3),
        "first_detect_s": round(first_call_s, 2),
        "detection_mismatches": mismatches,
        "streaming_fps_via_bundle": round(statistics.median(rates), 2),
        "dynamic_batch_mismatches": dyn_mismatches,
    }
    art = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts")
    os.makedirs(art, exist_ok=True)
    with open(os.path.join(art, "serving_check.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    assert mismatches == 0, "bundle detections diverged from the live detector"
    assert dyn_mismatches == 0, "dynamic-batch bundle diverged from the live detector"


if __name__ == "__main__":
    main()
