"""Serving soak: sustained streaming detection on the attached TPU.

Pushes N YUV420 VGA frames through ``CascadeDetector.detect_batch_yuv420``
in batches (the production serving path: staged uploads, batched program,
software pipeline, host unpack), tracking per-batch latency drift, device
memory growth, and detection-output stability across repeats of the same
frames — the long-running-service health checks a deployment would watch.

Usage: python tools/soak.py [n_frames] [--bundle]

``--bundle`` runs the same soak through an AOT serving bundle
(serve.export_detector -> save -> load -> ServingDetector) instead of the
live detector — the deployment artifact under sustained load.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import jax
import numpy as np

cache_dir = os.environ.get("RODC_JIT_CACHE", "/tmp/rodc_jit_cache")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    args = [a for a in sys.argv[1:] if a != "--bundle"]
    use_bundle = "--bundle" in sys.argv[1:]
    n_frames = int(args[0]) if args else 512

    import train_flagship
    from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
    from rapidobjectdetectionusingcascadedcnns_tpu.data import synthetic
    from rapidobjectdetectionusingcascadedcnns_tpu.models import cascade as casc
    from rapidobjectdetectionusingcascadedcnns_tpu.ops.color import rgb_to_yuv420

    cf.reset()
    model = train_flagship.load_flagship()
    caps = None
    eval_json = os.path.join(train_flagship.ARTIFACT_DIR, "flagship_eval.json")
    if os.path.exists(eval_json):
        with open(eval_json) as f:
            q = json.load(f)
        caps = train_flagship.capacity_schedule_from_quality(q)
        cf.set("cascade_capacity_schedule", caps)

    if use_bundle:
        import tempfile

        from rapidobjectdetectionusingcascadedcnns_tpu import serve

        cf.set("nms_on_device", True)
        bundle = serve.export_detector(
            model, 480, 640, yuv=True, capacities=caps, n_rungs=3,
            resample_impl="xla",
        )
        _bundle_dir = tempfile.mkdtemp(prefix="soak_bundle_")
        serve.save_bundle(bundle, _bundle_dir)
        served = serve.load_bundle(_bundle_dir)

        class _BundleAdapter:
            def detect_batch_yuv420(self, frames):
                return served.detect_batch(frames)

        detector = _BundleAdapter()
    else:
        detector = casc.CascadeDetector(model)
    scenes = [
        rgb_to_yuv420(
            synthetic.make_scene(480, 640, 3, seed=s, min_face=48, max_face=120).image
        )
        for s in range(32)
    ]

    batch = int(cf.get("inference_batch_frames"))
    dev = jax.devices()[0]

    def mem_mb():
        try:
            stats = dev.memory_stats()
            return stats.get("bytes_in_use", 0) / 1e6
        except Exception:
            return float("nan")

    # warmup + reference detections for the repeated frames
    ref = detector.detect_batch_yuv420(scenes[:batch])
    ref_sig = [
        (len(r.boxes), round(float(np.sum(r.confidences)), 4)) for r in ref
    ]
    mem0 = mem_mb()

    lat = []
    drift = 0
    done = 0
    while done < n_frames:
        frames = [scenes[(done + i) % 32] for i in range(batch)]
        t0 = time.perf_counter()
        results = detector.detect_batch_yuv420(frames)
        lat.append(time.perf_counter() - t0)
        # stability: frames repeat every 32, so detections must be identical
        for i, r in enumerate(results):
            k = (done + i) % 32
            if k < batch:
                sig = (len(r.boxes), round(float(np.sum(r.confidences)), 4))
                if sig != ref_sig[k]:
                    drift += 1
        done += batch

    mem1 = mem_mb()
    lat_ms = np.asarray(lat) * 1e3
    first_q = lat_ms[: len(lat_ms) // 4].mean()
    last_q = lat_ms[-len(lat_ms) // 4 :].mean()
    out = {
        "path": "aot_bundle" if use_bundle else "live_detector",
        "n_frames": done,
        "batch": batch,
        "capacities": caps,
        "fps_overall": round(done / (lat_ms.sum() / 1e3), 1),
        "batch_ms_mean": round(float(lat_ms.mean()), 1),
        "batch_ms_p95": round(float(np.percentile(lat_ms, 95)), 1),
        "latency_drift_pct": round(100 * (last_q - first_q) / first_q, 1),
        "device_mem_mb_start": round(mem0, 1),
        "device_mem_mb_end": round(mem1, 1),
        "detection_drift_count": drift,
    }
    print(json.dumps(out))
    assert drift == 0, "detections drifted across repeats of identical frames"
    assert abs(out["latency_drift_pct"]) < 25, "latency drifted >25% over the soak"


if __name__ == "__main__":
    main()
