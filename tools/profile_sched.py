"""TPU correctness + speed of the scheduled (v2) extraction kernel.

Usage: python tools/profile_sched.py [fddb|vga]
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

from rapidobjectdetectionusingcascadedcnns_tpu.data import synthetic
from rapidobjectdetectionusingcascadedcnns_tpu.ops import windows_pallas, windows_sched
from rapidobjectdetectionusingcascadedcnns_tpu.ops.pyramid import build_plan, window_table

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
    which = sys.argv[1] if len(sys.argv) > 1 else "fddb"
    if which == "fddb":
        img_h, img_w, wsf = 450, 450, 1.005
    else:
        img_h, img_w, wsf = 480, 640, 1.1

    @jax.jit
    def trivial(x):
        return x + 1.0

    t_floor = timeit(lambda: fetch(trivial(jnp.float32(1.0))))
    print(f"floor: {t_floor:.1f} ms")

    plan = build_plan(img_h, img_w, 12, 12, 0.075, wsf)
    table = window_table(plan)
    boxes = jnp.asarray(table["boxes_float"].astype(np.float32))
    sched = windows_sched.schedule_for_plan(plan, 12, 12)
    from collections import Counter

    cnt = Counter()
    for c in sched.classes:
        cnt[(c.cell_r, c.cell_c)] += c.n_tiles
    print(f"{plan.n_windows} windows; classes {dict(cnt)}")

    img = jnp.asarray(
        synthetic.make_scene(img_h, img_w, 3, seed=0, min_face=48, max_face=120).image,
        jnp.float32,
    )

    # correctness: compare against v1 on a strided subset of windows
    got = windows_sched.extract_scheduled(img, boxes, sched)
    idx = np.arange(0, plan.n_windows, max(1, plan.n_windows // 4000))
    got_sub = np.asarray(got[jnp.asarray(idx)])
    ref_sub = np.asarray(
        windows_pallas.crop_and_resize_pallas(
            img, boxes[jnp.asarray(idx)], out_h=12, out_w=12
        )
    )
    neq = got_sub != ref_sub
    print(
        f"correctness vs v1 on {len(idx)} windows: {neq.sum()}/{ref_sub.size} "
        f"mismatches, max |diff| {np.abs(got_sub - ref_sub).max()}"
    )

    # speed: K iterations inside one jit
    def scan_time(body, label):
        @jax.jit
        def run(image):
            def step(carry, _):
                im = image.at[0, 0, 0].add(carry * 1e-30)
                return body(im), None

            out, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=K)
            return out

        t = timeit(lambda: fetch(run(img)))
        print(f"{label:32s}: {(t - t_floor)/K:7.1f} ms")

    scan_time(
        lambda im: jnp.sum(
            windows_sched.extract_scheduled(im, boxes, sched, out_dtype=jnp.bfloat16)
            .astype(jnp.float32)[:, 0, 0, 0]
        ),
        "v2 scheduled extract (bf16 out)",
    )
    scan_time(
        lambda im: jnp.sum(
            windows_sched.extract_scheduled(
                im, boxes, sched, out_dtype=jnp.bfloat16, reorder=False
            )
            .astype(jnp.float32)[:, 0, 0, 0]
        ),
        "v2 scheduled, no reorder",
    )

    from rapidobjectdetectionusingcascadedcnns_tpu.ops.windows import crop_and_resize_impl

    def v1_chunked(im):
        n = boxes.shape[0]
        chunk = 16384
        n_chunks = -(-n // chunk)
        pad = n_chunks * chunk - n
        boxes_p = jnp.concatenate([boxes, jnp.broadcast_to(boxes[-1:], (pad, 4))])
        boxes_c = boxes_p.reshape(n_chunks, chunk, 4)

        def one(bc):
            w = crop_and_resize_impl(im, bc, 12, 12, True, False, "pallas")
            return w[:, 0, 0, 0]

        return jnp.sum(jax.lax.map(one, boxes_c))

    scan_time(v1_chunked, "v1 pallas chunked")


if __name__ == "__main__":
    main()
