"""Device-side profiling of the cascade hot path on the attached TPU.

Times each pipeline piece in isolation (output reduced to a scalar and
fetched, since block_until_ready is unreliable through the tunnel):
  * stage-0 window extraction (crop mode: chunked interpolation einsum)
  * stage-0 CNN over extracted windows
  * fused extract+CNN (what _apply_stage_on_boxes_chunked runs)
  * full cascade program
at FDDB density (450x450, wsf 1.005) and VGA (480x640, wsf 1.1).

Usage: python tools/profile_device.py [fddb|vga|both]
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
from rapidobjectdetectionusingcascadedcnns_tpu.models import cnn
from rapidobjectdetectionusingcascadedcnns_tpu.ops.pyramid import build_plan, window_table
from rapidobjectdetectionusingcascadedcnns_tpu.ops import windows as win_ops


def fetch(x):
    return float(np.asarray(jnp.sum(x)))


def timeit(fn, reps=5):
    fn()  # warmup/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), sorted(ts)[len(ts) // 2]


def profile_case(name, img_h, img_w, wsf, chunk):
    cf.reset()
    cf.set("conv_filter_sizes", [32])
    cf.set("fc1_size", 512)
    cf.set("cascade_n_nets", 3)
    cf.set("img_width", 48)
    cf.set("window_scale_factor", wsf)
    cf.set("min_window_length", 0.075)
    cf.set("inference_chunk_size", chunk)

    model = casc.build_cascade_model(seed=0)
    plan = build_plan(img_h, img_w, 12, 12, 0.075, wsf)
    table = window_table(plan)
    boxes_float = jnp.asarray(table["boxes_float"])
    coords = jnp.asarray(table["coords_norm"], jnp.int32)
    n = plan.n_windows
    print(f"--- {name}: {img_h}x{img_w} wsf={wsf} -> {n} windows, {plan.n_scales} scales, chunk={chunk}")

    img = jnp.asarray(
        synthetic.make_scene(img_h, img_w, n_faces=3, seed=0, min_face=48, max_face=120).image,
        jnp.float32,
    )

    # 1. extraction alone (crop mode)
    @jax.jit
    def extract_only(image, boxes):
        w = win_ops.crop_windows_chunked(image, boxes, 12, 12, chunk=chunk)
        return jnp.sum(w)

    tmin, tmed = timeit(lambda: fetch(extract_only(img, boxes_float)))
    print(f"stage0 extract (crop) : min {tmin*1e3:8.1f} ms  med {tmed*1e3:8.1f} ms")

    # 2. stage-0 CNN alone on premade windows (chunked like the real path)
    params0 = jax.tree_util.tree_map(jnp.asarray, model.stage_params[0])
    sc0 = model.stage_configs[0]
    mean0 = jnp.asarray(model.stage_means[0])
    std0 = jnp.asarray(model.stage_stds[0])

    n_chunks = -(-n // chunk)
    wins_fake = jnp.zeros((n_chunks, chunk, 12, 12, 3), jnp.float32)

    @jax.jit
    def cnn_only(wins):
        def one(wc):
            out = cnn.apply_stage(params0, sc0, (wc - mean0) / std0)
            return out["probs"]

        probs = jax.lax.map(one, wins)
        return jnp.sum(probs)

    tmin, tmed = timeit(lambda: fetch(cnn_only(wins_fake)))
    print(f"stage0 CNN only       : min {tmin*1e3:8.1f} ms  med {tmed*1e3:8.1f} ms")

    # 3. fused extract+CNN (the real stage-0 crop path)
    from rapidobjectdetectionusingcascadedcnns_tpu.models.cascade import (
        _apply_stage_on_boxes_chunked,
    )

    @jax.jit
    def fused(image, boxes):
        probs, bott = _apply_stage_on_boxes_chunked(
            image, boxes, None, params0, sc0, mean0, std0, chunk, False
        )
        return jnp.sum(probs) + jnp.sum(bott[:, :1])

    tmin, tmed = timeit(lambda: fetch(fused(img, boxes_float))
    )
    print(f"stage0 extract+CNN    : min {tmin*1e3:8.1f} ms  med {tmed*1e3:8.1f} ms")

    # 4. stage 1/2 style: crop_and_resize of K survivors at 24/48
    for size, cap in ((24, max(256, ((n // 2 + 127) // 128) * 128)), (48, max(256, ((n // 8 + 127) // 128) * 128))):
        cap = min(cap, n)
        boxes_surv = coords[:cap].astype(jnp.float32)

        @jax.jit
        def crop_next(image, b):
            w = win_ops.crop_windows_chunked(image, b, size, size, chunk=min(chunk, 16384))
            return jnp.sum(w)

        tmin, tmed = timeit(lambda: fetch(crop_next(img, boxes_surv)))
        print(f"re-extract {cap:6d}@{size:2d}  : min {tmin*1e3:8.1f} ms  med {tmed*1e3:8.1f} ms")

    # 5. full cascade single image
    detector = casc.CascadeDetector(model)
    det = lambda: detector.detect(np.asarray(img, np.uint8))
    tmin, tmed = timeit(det, reps=3)
    print(f"full cascade (1 img)  : min {tmin*1e3:8.1f} ms  med {tmed*1e3:8.1f} ms")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("vga", "both"):
        profile_case("VGA", 480, 640, 1.1, 16384)
    if which in ("fddb", "both"):
        profile_case("FDDB", 450, 450, 1.005, 16384)
