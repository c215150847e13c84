"""Stage-0 VGA extraction variants: double-gather vs strided/static slices.

The plan's xs/ys are arithmetic progressions on every level (stride 4/3/2/1
at VGA), so the two fancy-index gathers of ops/windows._windows_one_scale can
be replaced by pure strided + static slices — no gather lowering at all. The
column gather in particular has a 3-float inner dim (C=3), far below the TPU
lane granularity.

Times each variant as a K-iteration lax.scan over DISTINCT batched inputs
(CSE-proof) inside one jit, batch 16 VGA frames, reporting per-frame ms.

Usage: python tools/profile_extract_variants.py
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
from rapidobjectdetectionusingcascadedcnns_tpu.ops import windows as W
from rapidobjectdetectionusingcascadedcnns_tpu.ops.pyramid import build_plan

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


def slices_one_scale(img, xs, ys, wh, ww):
    """(sh, sw, C) -> (nx*ny, wh, ww, C) via strided + static slices only."""
    ny, nx = len(ys), len(xs)
    y0 = int(ys[0])
    x0 = int(xs[0])
    sy = int(ys[1] - ys[0]) if ny > 1 else 1
    sx = int(xs[1] - xs[0]) if nx > 1 else 1
    rows = jnp.stack(
        [
            jax.lax.slice_in_dim(img, y0 + j, y0 + j + sy * (ny - 1) + 1, sy, axis=0)
            for j in range(wh)
        ],
        axis=1,
    )  # (ny, wh, sw, C)
    wins = jnp.stack(
        [
            jax.lax.slice_in_dim(rows, x0 + i, x0 + i + sx * (nx - 1) + 1, sx, axis=2)
            for i in range(ww)
        ],
        axis=3,
    )  # (ny, wh, nx, ww, C)
    wins = jnp.transpose(wins, (2, 0, 1, 3, 4))
    return wins.reshape(nx * ny, wh, ww, img.shape[-1])


def extract_windows_slices(image, plan, *, quantize=True, antialias=True):
    image = image.astype(jnp.float32)
    parts = []
    for s in plan.scales:
        scaled = W.resize_image(image, s.scaled_h, s.scaled_w, antialias=antialias)
        if quantize and s.scale != 1.0:
            scaled = W._quantize_u8(scaled)
        parts.append(
            slices_one_scale(
                scaled, np.asarray(s.xs), np.asarray(s.ys), plan.window_h, plan.window_w
            )
        )
    return jnp.concatenate(parts, axis=0)


def resizes_only(image, plan):
    image = image.astype(jnp.float32)
    acc = jnp.zeros((), jnp.float32)
    for s in plan.scales:
        scaled = W.resize_image(image, s.scaled_h, s.scaled_w)
        if s.scale != 1.0:
            scaled = W._quantize_u8(scaled)
        acc = acc + jnp.sum(scaled[::8, ::8])
    return acc


def main():
    cf.reset()
    plan = build_plan(
        480, 640, 12, 12, float(cf.get("min_window_length")), float(cf.get("window_scale_factor"))
    )
    print(f"plan: {plan.n_scales} scales, {plan.n_windows} windows")
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, size=(K, BATCH, 480, 640, 3), dtype=np.uint8)
    imgs_d = jnp.asarray(imgs, dtype=jnp.float32)

    # parity check first (single frame)
    ref = np.asarray(W.extract_windows(imgs_d[0, 0], plan))
    alt = np.asarray(jax.jit(lambda im: extract_windows_slices(im, plan))(imgs_d[0, 0]))
    mism = int((ref != alt).sum())
    print(f"slices vs gather parity: {mism}/{ref.size} mismatches")

    def scan_harness(fn):
        @jax.jit
        def run(xs):
            def body(c, x):
                out = jax.vmap(fn)(x)
                return c + jnp.sum(out.astype(jnp.float32)), 0.0

            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), xs)
            return acc

        return lambda: float(np.asarray(run(imgs_d)))

    variants = {
        "gather (current)": lambda im: W.extract_windows(im, plan),
        "slices": lambda im: extract_windows_slices(im, plan),
        "resizes only": lambda im: resizes_only(im, plan),
    }
    for name, fn in variants.items():
        ms = timeit(scan_harness(fn))
        per_frame = ms / (K * BATCH)
        print(f"{name:20s}: {ms:7.1f} ms total  {per_frame:6.3f} ms/frame")


if __name__ == "__main__":
    main()
