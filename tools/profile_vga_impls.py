"""Full-cascade VGA device cost across resample impls, CSE-proof.

Wraps the batch-16 flagship cascade in a K-iteration lax.scan over DISTINCT
frame batches inside one jit, so per-iteration cost excludes the tunnel floor
and CSE cannot collapse iterations. Reports ms/frame per resample impl, plus
a stage-0-only (2-net submodel skipped — instead capacity-1 stages) probe.

Usage: python tools/profile_vga_impls.py [impl ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache_dir = os.environ.get("RODC_JIT_CACHE", "/tmp/rodc_jit_cache")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
from rapidobjectdetectionusingcascadedcnns_tpu.data import synthetic
from rapidobjectdetectionusingcascadedcnns_tpu.models import cascade as casc
from rapidobjectdetectionusingcascadedcnns_tpu.ops.color import rgb_to_yuv420

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
import train_flagship

K = 4
BATCH = 16


def timeit(fn, reps=3):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    import json

    cf.reset()
    model = train_flagship.load_flagship()
    with open(os.path.join(train_flagship.ARTIFACT_DIR, "flagship_eval.json")) as f:
        quality = json.load(f)
    cf.set("foreground_confidence_threshold", float(quality["threshold"]))
    caps = tuple(train_flagship.capacity_schedule_from_quality(quality))
    print("caps:", caps)
    detector = casc.CascadeDetector(model)
    plan, table, coords_norm, boxes_float = detector._plan_and_table(480, 640)
    thresholds = tuple(casc.resolve_thresholds(model.n_nets))
    stage_configs = tuple(model.stage_configs)
    confidence_mode = str(cf.get("final_confidence_calculation"))

    scenes = np.stack(
        [
            synthetic.make_scene(480, 640, n_faces=3, seed=s, min_face=48, max_face=120).image
            for s in range(K * BATCH)
        ]
    ).reshape(K, BATCH, 480, 640, 3)
    ys = np.stack([np.stack([rgb_to_yuv420(f)[0] for f in b]) for b in scenes])
    uvs = np.stack([np.stack([rgb_to_yuv420(f)[1] for f in b]) for b in scenes])
    ys_d = jnp.asarray(ys)
    uvs_d = jnp.asarray(uvs)

    nms_mn = int(cf.get("nms_opencv_min_neighbors"))

    impls = sys.argv[1:] or ["xla", "pallas", "pallas2dyn"]
    for impl in impls:
        @jax.jit
        def run(ys_k, uvs_k):
            def body(c, args):
                y, uv = args
                out = casc._cascade_infer_device_batch_yuv(
                    y, uv, coords_norm, boxes_float,
                    detector._params_device, detector._stats_device, plan,
                    stage_configs, caps, confidence_mode, thresholds,
                    False, "gather", 16384, nms_mn, impl, "scan",
                )
                return c + jnp.sum(out), 0.0

            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), (ys_k, uvs_k))
            return acc

        try:
            ms = timeit(lambda: float(np.asarray(run(ys_d, uvs_d))))
            print(f"{impl:12s}: {ms:7.1f} ms total  {ms / (K * BATCH):6.3f} ms/frame")
        except Exception as e:  # noqa: BLE001
            print(f"{impl:12s}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
