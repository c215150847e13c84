"""Micro-profile of the window re-extraction kernels at FDDB density.

Times the stage-1/2 survivor re-extraction (the replacement of the
reference's per-window host cv2.resize, app/inference_cascade_app.py:346-401)
across implementations: XLA interpolation einsums, v1 Pallas (serial
per-window horizontal matmuls), v1 Pallas block-diagonal (one horizontal
matmul per tile), and the scheduled stage-0 kernel serial vs block-diagonal.
K iterations inside one jitted lax.scan remove the tunnel dispatch floor.

Usage: python tools/profile_reextract.py
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

from rapidobjectdetectionusingcascadedcnns_tpu.ops import (
    windows,
    windows_pallas,
    windows_sched,
)
from rapidobjectdetectionusingcascadedcnns_tpu.ops.pyramid import (
    build_plan,
    window_table,
)

K = 8


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
    img_h = img_w = 450
    plan = build_plan(img_h, img_w, 12, 12, 0.075, 1.005)
    table = window_table(plan)
    all_boxes = table["boxes_float"].astype(np.float32)
    n = plan.n_windows
    print(f"plan: {n} windows")

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 256, (img_h, img_w, 3)).astype(np.float32))

    @jax.jit
    def trivial(x):
        return x + 1.0

    t_floor = timeit(lambda: fetch(trivial(jnp.float32(1.0))))
    print(f"floor: {t_floor:.1f} ms")

    def scan_time(make_out, label):
        @jax.jit
        def run(image):
            def step(carry, _):
                im = image.at[0, 0, 0].add(carry * 1e-30)
                return jnp.sum(make_out(im)), None

            out, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=K)
            return out

        t = timeit(lambda: fetch(run(img)))
        print(f"  {label:40s}: {(t - t_floor)/K:8.2f} ms")

    # survivor boxes: a random subsample of the plan's distribution
    for cap, out in ((16512, 24), (4224, 48)):
        sel = np.sort(rng.choice(n, size=cap, replace=False))
        boxes = jnp.asarray(all_boxes[sel])
        print(f"re-extract cap={cap} out={out}:")
        scan_time(
            lambda im, b=boxes, o=out: windows.crop_and_resize_impl(
                im, b, o, o, True, False, "xla"
            ),
            "xla einsum",
        )
        scan_time(
            lambda im, b=boxes, o=out: windows_pallas.crop_and_resize_pallas(
                im, b, out_h=o, out_w=o, blockdiag=False
            ),
            "pallas v1 serial",
        )
        scan_time(
            lambda im, b=boxes, o=out: windows_pallas.crop_and_resize_pallas(
                im, b, out_h=o, out_w=o, blockdiag=True
            ),
            "pallas v1 blockdiag",
        )
        from rapidobjectdetectionusingcascadedcnns_tpu.ops import windows_dyn

        big_cap = windows_dyn.default_big_cap(cap, out, out, img_h)
        scan_time(
            lambda im, b=boxes, o=out, bc=big_cap: windows_dyn.extract_rowbound(
                im, b, o, o, big_cap=bc, out_dtype=jnp.bfloat16
            )[0].astype(jnp.float32),
            f"dyn rowbound (big_cap {big_cap})",
        )

    # stage-0 scheduled extraction over the FULL static plan
    sched = windows_sched.schedule_for_plan(plan, 12, 12)
    boxes_full = jnp.asarray(all_boxes)
    print("stage-0 scheduled extraction (full plan):")
    scan_time(
        lambda im: windows_sched.extract_scheduled(
            im, boxes_full, sched, out_dtype=jnp.bfloat16, reorder=False,
            blockdiag=False,
        ).astype(jnp.float32),
        "sched serial",
    )
    scan_time(
        lambda im: windows_sched.extract_scheduled(
            im, boxes_full, sched, out_dtype=jnp.bfloat16, reorder=False,
            blockdiag=True,
        ).astype(jnp.float32),
        "sched blockdiag",
    )
    scan_time(
        lambda im: windows_pallas.crop_and_resize_pallas(
            im, boxes_full, out_h=12, out_w=12, blockdiag=True
        ),
        "stage-0 v1 blockdiag (no schedule)",
    )


if __name__ == "__main__":
    main()
