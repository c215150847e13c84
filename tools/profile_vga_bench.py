"""Bisect the device cost of the exact batched VGA program bench.py times.

Uses the trained flagship artifact + measured capacities (like bench.py),
wraps the batched YUV cascade in a K-iteration scan inside one jit to
exclude the tunnel floor, and also times stage-0-only and no-NMS variants.

Usage: python tools/profile_vga_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

cache_dir = os.environ.get("RODC_JIT_CACHE", "/tmp/rodc_jit_cache")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
from rapidobjectdetectionusingcascadedcnns_tpu.data import synthetic
from rapidobjectdetectionusingcascadedcnns_tpu.models import cascade as casc
from rapidobjectdetectionusingcascadedcnns_tpu.ops.color import rgb_to_yuv420
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

K = 4


def fetch(x):
    return float(np.asarray(x))


def timeit(fn, reps=3):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    cf.reset()

    @jax.jit
    def trivial(x):
        return x + 1.0

    t_floor = timeit(lambda: fetch(trivial(jnp.float32(1.0))))
    print(f"floor: {t_floor:.1f} ms")

    import json

    import train_flagship

    model = train_flagship.load_flagship()
    with open(os.path.join(train_flagship.ARTIFACT_DIR, "flagship_eval.json")) as f:
        quality = json.load(f)
    caps = tuple(train_flagship.capacity_schedule_from_quality(quality))
    print(f"caps {caps}")

    detector = casc.CascadeDetector(model)
    plan, table, coords_norm, boxes_float = detector._plan_and_table(480, 640)
    thresholds = tuple(casc.resolve_thresholds(model.n_nets))
    params = detector._params_device
    stats = detector._stats_device
    cfgs = tuple(model.stage_configs)
    mode = cf.get("final_confidence_calculation")
    ext_mode = casc.resolve_extraction_mode(plan)
    resample = casc.resolve_resample_impl()
    chunk = int(cf.get("inference_chunk_size"))
    print(f"ext={ext_mode} resample={resample} n_windows={plan.n_windows} n_scales={plan.n_scales}")

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else int(cf.get("inference_batch_frames"))
    scenes = [
        synthetic.make_scene(480, 640, 3, seed=s, min_face=48, max_face=120).image
        for s in range(batch)
    ]
    yuv = [rgb_to_yuv420(s) for s in scenes]
    ys = jnp.asarray(np.stack([y for y, _ in yuv]))
    uvs = jnp.asarray(np.stack([uv for _, uv in yuv]))

    from rapidobjectdetectionusingcascadedcnns_tpu.ops import color as color_ops

    def scan_batch(label, nms_mn=-1, ext=None, rs=None):
        em = ext or ext_mode
        ri = rs or resample

        @jax.jit
        def run(y, uv):
            def step(carry, _):
                yi = y.at[0, 0, 0].add((carry * 1e-30).astype(y.dtype))

                def one(args):
                    yy, uu = args
                    img = color_ops.yuv420_to_rgb(yy, uu)
                    out = casc._cascade_core(
                        img, coords_norm, boxes_float, params, stats, plan,
                        cfgs, caps, mode, thresholds, False, em, chunk,
                        nms_mn, ri,
                    )
                    return casc._pack_result(*out)

                packed = jax.vmap(one)((yi, uv))
                return jnp.sum(packed[:, 0]), None

            out, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=K)
            return out

        t = timeit(lambda: fetch(run(ys, uvs)))
        per_frame = (t - t_floor) / K / batch
        print(f"{label:36s}: {(t - t_floor)/K:7.1f} ms/batch  {per_frame:6.2f} ms/frame")

    scan_batch(f"full batch={batch} ({ext_mode})")
    scan_batch("full, crop+pallas stage0", ext="crop")
    scan_batch("full, crop+pallas2 stage0", ext="crop", rs="pallas2")
    scan_batch("full, dev-NMS", nms_mn=1)

    # stage-0 only (extraction + CNN over all windows, batched)
    def stage0_batch(label, em):
        @jax.jit
        def run(y, uv):
            def step(carry, _):
                yi = y.at[0, 0, 0].add((carry * 1e-30).astype(y.dtype))

                def one(args):
                    yy, uu = args
                    img = color_ops.yuv420_to_rgb(yy, uu).astype(jnp.float32)
                    if em == "crop":
                        probs0, bott = casc._apply_stage_on_boxes_chunked(
                            img, boxes_float, None, params[0], cfgs[0],
                            stats[0][0], stats[0][1], chunk, False, resample,
                        )
                    else:
                        from rapidobjectdetectionusingcascadedcnns_tpu.ops.windows import extract_windows
                        from rapidobjectdetectionusingcascadedcnns_tpu.models import cnn

                        w = extract_windows(img, plan)
                        out = cnn.apply_stage(
                            params[0], cfgs[0], (w - stats[0][0]) / stats[0][1]
                        )
                        probs0, bott = out["probs"], out["bottleneck"]
                    return jnp.sum(probs0) + jnp.sum(bott[:, 0])

                s = jax.vmap(one)((yi, uv))
                return jnp.sum(s), None

            out, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=K)
            return out

        t = timeit(lambda: fetch(run(ys, uvs)))
        per_frame = (t - t_floor) / K / batch
        print(f"{label:36s}: {(t - t_floor)/K:7.1f} ms/batch  {per_frame:6.2f} ms/frame")

    stage0_batch("stage0 only (gather)", "gather")

    # compaction sorts alone: argsort over n_windows + cap, per frame, vmapped
    n = plan.n_windows

    def sort_probe():
        pf = jnp.zeros((batch, n), jnp.float32)

        @jax.jit
        def run(p):
            def step(carry, _):
                pi = p.at[0, 0].add(carry * 1e-30)

                def one(row):
                    order = jnp.argsort(-row)
                    return jnp.sum(order[: caps[0]].astype(jnp.float32))

                return jnp.sum(jax.vmap(one)(pi)), None

            out, _ = jax.lax.scan(run_init := step, jnp.float32(0.0), None, length=K)
            return out

        t = timeit(lambda: fetch(run(pf)))
        per_frame = (t - t_floor) / K / batch
        print(f"{'argsort probe':36s}: {(t - t_floor)/K:7.1f} ms/batch  {per_frame:6.2f} ms/frame")

    sort_probe()


if __name__ == "__main__":
    main()
