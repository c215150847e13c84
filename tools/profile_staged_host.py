"""Measure the staged-loop host tail: fetch + per-frame unpack, host vs dev NMS.

Replicates bench.py's staged measurement exactly (12 batches x
inference_batch_frames staged in HBM, dispatch all, fetch + unpack each) and
reports the end-to-end staged fps for: host-NMS unpack, dev-NMS unpack, and a
fetch-only variant (no unpack) that isolates the host share.

Usage: python tools/profile_staged_host.py
"""

import json
import os
import statistics
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


def main():
    cf.reset()
    model = train_flagship.load_flagship()
    with open(os.path.join(train_flagship.ARTIFACT_DIR, "flagship_eval.json")) as f:
        quality = json.load(f)
    cf.set("foreground_confidence_threshold", float(quality["threshold"]))
    caps = tuple(train_flagship.capacity_schedule_from_quality(quality))
    detector = casc.CascadeDetector(model)
    plan, table, coords_norm, boxes_float = detector._plan_and_table(480, 640)
    thresholds = tuple(casc.resolve_thresholds(model.n_nets))

    n_scenes = 32
    scenes = [
        synthetic.make_scene(480, 640, n_faces=3, seed=s, min_face=48, max_face=120).image
        for s in range(n_scenes)
    ]
    yuv_scenes = [rgb_to_yuv420(s) for s in scenes]
    batch = int(cf.get("inference_batch_frames"))
    n_batches = 12
    n_frames = n_batches * batch

    staged = []
    for b in range(n_batches):
        ys = np.stack([yuv_scenes[(b * batch + i) % n_scenes][0] for i in range(batch)])
        uvs = np.stack([yuv_scenes[(b * batch + i) % n_scenes][1] for i in range(batch)])
        staged.append((jax.device_put(jnp.asarray(ys)), jax.device_put(jnp.asarray(uvs))))

    def common_for(nms_mn):
        return (
            coords_norm, boxes_float, detector._params_device,
            detector._stats_device, plan, tuple(model.stage_configs), caps,
            cf.get("final_confidence_calculation"), thresholds, False,
            casc.resolve_extraction_mode(plan), int(cf.get("inference_chunk_size")),
            nms_mn, casc.resolve_resample_impl(), casc.resolve_compaction(),
        )

    # variant: ONE jitted program lax.maps over all staged chunks (offline
    # mode) — a single dispatch+fetch instead of n_batches of them
    common = common_for(-1)
    ys_all = jnp.stack([y for (y, _) in staged])   # (n_batches, B, H, W)
    uvs_all = jnp.stack([uv for (_, uv) in staged])

    @jax.jit
    def offline(ys, uvs):
        return jax.lax.map(
            lambda args: casc._cascade_infer_device_batch_yuv(*args, *common),
            (ys, uvs),
        )

    _ = np.asarray(offline(ys_all, uvs_all))
    rates = []
    for _rep in range(5):
        t0 = time.perf_counter()
        rows_all = np.asarray(offline(ys_all, uvs_all)).reshape(n_frames, -1)
        for j in range(rows_all.shape[0]):
            detector._unpack_row(rows_all[j], caps, plan, table, False, 480)
        rates.append(n_frames / (time.perf_counter() - t0))
    med = statistics.median(rates)
    print(f"{'offline lax.map one-dispatch':34s}: median {med:6.1f} fps  ({[round(r,1) for r in sorted(rates)]})")

    # variant: dispatch all batch programs, then fetch ONE device-side
    # concatenation of their packed results — 1 tunnel round-trip instead of
    # n_batches of them
    common = common_for(-1)
    _ = np.asarray(casc._cascade_infer_device_batch_yuv(*staged[0], *common))
    rates = []
    for _rep in range(5):
        t0 = time.perf_counter()
        packed = [
            casc._cascade_infer_device_batch_yuv(y, uv, *common)
            for (y, uv) in staged
        ]
        rows_all = np.asarray(jnp.concatenate(packed, axis=0))
        for j in range(rows_all.shape[0]):
            detector._unpack_row(rows_all[j], caps, plan, table, False, 480)
        rates.append(n_frames / (time.perf_counter() - t0))
    med = statistics.median(rates)
    print(f"{'concat fetch + host-NMS unpack':34s}: median {med:6.1f} fps  ({[round(r,1) for r in sorted(rates)]})")

    for label, nms_mn, unpack in (
        ("host-NMS unpack (bench today)", -1, True),
        ("dev-NMS unpack", int(cf.get("nms_opencv_min_neighbors")), True),
        ("fetch only, no unpack", -1, False),
    ):
        common = common_for(nms_mn)
        nms_on_device = nms_mn >= 0
        _ = np.asarray(casc._cascade_infer_device_batch_yuv(*staged[0], *common))
        rates = []
        for _rep in range(5):
            t0 = time.perf_counter()
            packed = [
                casc._cascade_infer_device_batch_yuv(y, uv, *common)
                for (y, uv) in staged
            ]
            for p in packed:
                rows = np.asarray(p)
                if unpack:
                    for j in range(rows.shape[0]):
                        detector._unpack_row(
                            rows[j], caps, plan, table, nms_on_device, 480
                        )
            rates.append(n_frames / (time.perf_counter() - t0))
        med = statistics.median(rates)
        print(f"{label:34s}: median {med:6.1f} fps  ({[round(r,1) for r in sorted(rates)]})")


if __name__ == "__main__":
    main()
