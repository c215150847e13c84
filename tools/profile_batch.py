"""Per-frame device compute via batch-size slope (removes tunnel latency).

Times the real batched cascade program at several frame batch sizes with
device-resident inputs; the slope of time-vs-batch is the per-frame compute
cost, the intercept is the dispatch+fetch latency floor.
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
from rapidobjectdetectionusingcascadedcnns_tpu.models.cascade import (
    _cascade_infer_device_batch,
    default_capacity_schedule,
    resolve_extraction_mode,
    resolve_thresholds,
)
from rapidobjectdetectionusingcascadedcnns_tpu.ops.pyramid import build_plan, window_table


def main():
    cf.set("conv_filter_sizes", [32])
    cf.set("fc1_size", 512)
    cf.set("cascade_n_nets", 3)
    cf.set("img_width", 48)
    cf.set("window_scale_factor", 1.1)
    cf.set("min_window_length", 0.075)
    cf.set("foreground_confidence_threshold", 0.5)

    model = casc.build_cascade_model(seed=0)
    plan = build_plan(480, 640, 12, 12, 0.075, 1.1)
    table = window_table(plan)
    coords = jnp.asarray(table["coords_norm"], jnp.int32)
    boxes_f = jnp.asarray(table["boxes_float"])
    caps = tuple(default_capacity_schedule(plan.n_windows, 3))
    thr = tuple(resolve_thresholds(3))
    em = resolve_extraction_mode(plan)
    params = tuple(jax.tree_util.tree_map(jnp.asarray, p) for p in model.stage_params)
    stats = tuple(
        (jnp.asarray(m), jnp.asarray(s))
        for m, s in zip(model.stage_means, model.stage_stds)
    )
    print(f"plan: {plan.n_windows} windows, {plan.n_scales} scales, caps {caps}, mode {em}")

    img = synthetic.make_scene(480, 640, n_faces=3, seed=0, min_face=48, max_face=120).image

    for b in (4, 8, 16, 32):
        stack = jnp.asarray(np.stack([img] * b))

        def run():
            out = _cascade_infer_device_batch(
                stack, coords, boxes_f, params, stats, plan,
                tuple(model.stage_configs), caps, "last_step", thr,
                False, em, 16384, -1,
            )
            return float(np.asarray(out[0, 0]))

        run()
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        tmin = min(ts)
        print(f"batch {b:3d}: min {tmin*1e3:8.1f} ms  ({tmin/b*1e3:6.2f} ms/frame)  all {[round(t*1e3,1) for t in ts]}")


if __name__ == "__main__":
    main()
