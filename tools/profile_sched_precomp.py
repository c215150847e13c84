"""Experiment: precomputed extraction weights vs in-kernel VPU build.

The scheduled stage-0 kernel (ops/windows_sched.py) spends ~1/3 of its
time re-building the two-tap triangle weight matrices on the VPU every
frame — but those matrices are a pure function of the STATIC pyramid plan.
This experiment precomputes them once on device (same jnp expressions),
keeps them HBM-resident, and streams them into a variant kernel as blocked
operands, then compares end-to-end extraction time and output parity at
FDDB density (450x450 x wsf 1.005, 131,903 windows).

If the measured win justifies the ~1 GB HBM residency, the variant
graduates into windows_sched as an opt-in mode (NOTES.md round-4 item 1).

Usage: python tools/profile_sched_precomp.py [fddb|vga]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

cache_dir = os.environ.get("RODC_JIT_CACHE", "/tmp/rodc_jit_cache")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rapidobjectdetectionusingcascadedcnns_tpu.ops import windows_sched as ws
from rapidobjectdetectionusingcascadedcnns_tpu.ops.pyramid import (
    build_plan,
    window_table,
)

K = 8  # scan reps inside one dispatch


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


# ---------------------------------------------------------------------------
# precomputed-weights kernel variant


def _sched_kernel_pre(offs_ref, ry_ref, rx_ref, *refs, tile, c, out_h, out_w,
                      quantize, blockdiag=True):
    plane_refs = refs[:c]
    out_ref = refs[c]
    v_scratch = refs[c + 1]
    ry = ry_ref[:, :]  # (tile*out_h, cell_r) bf16, streamed from HBM
    rx = rx_ref[:, :]  # (cell_c, tile*out_w) bf16
    for ci in range(c):
        v_scratch[:, :] = jnp.dot(
            ry, plane_refs[ci][:, :], preferred_element_type=jnp.float32
        )
        p = jnp.dot(
            v_scratch[:, :].astype(jnp.bfloat16), rx,
            preferred_element_type=jnp.float32,
        )
        for t in range(tile):
            o = p[t * out_h : (t + 1) * out_h, t * out_w : (t + 1) * out_w]
            if quantize:
                o = jnp.clip(jnp.round(o), 0.0, 255.0)
            out_ref[
                ci * out_h : (ci + 1) * out_h, t * out_w : (t + 1) * out_w
            ] = o.astype(out_ref.dtype)


def _run_class_pre(planes, ry_all, rx_all, cls, sched, quantize, out_dtype):
    tile, out_h, out_w = sched.tile, sched.out_h, sched.out_w
    c = len(planes)
    plane_spec = pl.BlockSpec(
        (cls.cell_r, cls.cell_c), lambda i, offs: (offs[0, i], offs[1, i])
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(cls.n_tiles,),
        in_specs=[
            pl.BlockSpec((tile * out_h, cls.cell_r), lambda i, offs: (i, 0)),
            pl.BlockSpec((cls.cell_c, tile * out_w), lambda i, offs: (0, i)),
        ]
        + [plane_spec] * c,
        out_specs=pl.BlockSpec((c * out_h, tile * out_w), lambda i, offs: (0, i)),
        scratch_shapes=[pltpu.VMEM((tile * out_h, cls.cell_c), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(
            _sched_kernel_pre, tile=tile, c=c, out_h=out_h, out_w=out_w,
            quantize=quantize,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (c * out_h, cls.n_tiles * tile * out_w), out_dtype
        ),
    )(jnp.asarray(cls.offs), ry_all, rx_all, *planes)


def precompute_weights(boxes, sched):
    """Per-class HBM-resident (RY, RX) built by the SAME jnp expressions the
    kernel uses (bit-identical weights up to XLA fusion of the identical
    graph)."""
    tile, out_h, out_w = sched.tile, sched.out_h, sched.out_w
    n_tiles = sum(cl.n_tiles for cl in sched.classes)
    sy, sx = ws._sample_positions_jnp(boxes, sched.img_h, sched.img_w, out_h, out_w)
    slots = jnp.asarray(sched.order)
    sy_t = sy[slots].reshape(n_tiles, tile * out_h)
    sx_t = sx[slots].reshape(n_tiles, tile * out_w)
    out = []
    total_bytes = 0
    for cls in sched.classes:
        sel = jnp.asarray(cls.sel)
        roff = jnp.asarray((cls.offs[0] * cls.cell_r).astype(np.float32)[:, None])
        coff = jnp.asarray((cls.offs[1] * cls.cell_c).astype(np.float32)[:, None])
        sy_local = (sy_t[sel] - roff).reshape(-1, 1)  # (tiles*tile*out_h, 1)
        sx_local = (sx_t[sel] - coff).reshape(1, -1)  # (1, tiles*tile*out_w)
        r_iota = jnp.arange(cls.cell_r, dtype=jnp.float32)[None, :]
        ry = jnp.maximum(0.0, 1.0 - jnp.abs(r_iota - sy_local)).astype(jnp.bfloat16)
        c_iota = jnp.arange(cls.cell_c, dtype=jnp.float32)[:, None]
        rx = jnp.maximum(0.0, 1.0 - jnp.abs(c_iota - sx_local)).astype(jnp.bfloat16)
        ry, rx = jax.device_put(ry), jax.device_put(rx)
        total_bytes += ry.nbytes + rx.nbytes
        out.append((ry, rx))
    return out, total_bytes


def extract_precomp(image, weights, sched, out_dtype=jnp.float32):
    h, w, c = image.shape
    image = image.astype(jnp.float32)
    pad_r, pad_c = sched.h_pad - h, sched.w_pad - w
    if pad_r or pad_c:
        image = jnp.pad(image, ((0, pad_r), (0, pad_c), (0, 0)))
    planes = [image[:, :, ci].astype(jnp.bfloat16) for ci in range(c)]
    outs = []
    for cls, (ry, rx) in zip(sched.classes, weights):
        out = _run_class_pre(planes, ry, rx, cls, sched, True, out_dtype)
        out = out.reshape(c, sched.out_h, cls.n_tiles * sched.tile, sched.out_w)
        outs.append(jnp.transpose(out, (2, 1, 3, 0)))
    return jnp.concatenate(outs, axis=0)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "fddb"
    img_h, img_w, wsf = (450, 450, 1.005) if which == "fddb" else (480, 640, 1.1)

    @jax.jit
    def trivial(x):
        return x + 1.0

    t_floor = timeit(lambda: fetch(trivial(jnp.float32(1.0))))
    print(f"floor: {t_floor:.1f} ms")

    plan = build_plan(img_h, img_w, 12, 12, 0.075, wsf)
    table = window_table(plan)
    boxes_np = table["boxes_float"].astype(np.float32)
    sched = ws.build_schedule(boxes_np, img_h, img_w, 12, 12)
    if sched is None:
        print("no schedule for this geometry")
        return
    n_tiles = sum(cl.n_tiles for cl in sched.classes)
    print(f"{which}: {plan.n_windows} windows, {n_tiles} tiles, "
          f"{len(sched.classes)} classes "
          f"{[(c.cell_r, c.cell_c, c.n_tiles) for c in sched.classes]}")

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (img_h, img_w, 3)), jnp.float32)
    boxes = jnp.asarray(boxes_np)

    t0 = time.time()
    weights, wbytes = precompute_weights(boxes, sched)
    jax.block_until_ready(weights)
    print(f"weights: {wbytes/1e6:.0f} MB in {len(sched.classes)} classes "
          f"(one-time build {time.time()-t0:.1f}s incl compile)")

    # parity first
    # weights ride as ARGUMENTS, not jit-captured constants (1.6 GB of
    # constants exceeds the remote-compile payload limit)
    ref = np.asarray(
        jax.jit(lambda im: ws.extract_scheduled(im, boxes, sched, reorder=False,
                                                blockdiag=True))(img)
    )
    pre_fn = jax.jit(lambda im, wts: extract_precomp(im, wts, sched))
    got = np.asarray(pre_fn(img, weights))
    mism = int((ref != got).sum())
    print(f"parity vs in-kernel build: {mism}/{ref.size} mismatches")

    # timing: K-rep scan inside one dispatch
    def scanned(fn, *extra):
        @jax.jit
        def run(im, *ex):
            def step(carry, _):
                out = fn(im.at[0, 0, 0].add(carry * 1e-30), *ex)
                return jnp.sum(out[:, 0, 0, 0]), None

            out, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=K)
            return out

        return lambda: fetch(run(img, *extra))

    t_base = timeit(scanned(lambda im: ws.extract_scheduled(
        im, boxes, sched, reorder=False, blockdiag=True)))
    print(f"in-kernel build (blockdiag)  : {(t_base - t_floor)/K:8.1f} ms/img")
    t_pre = timeit(scanned(
        lambda im, wts: extract_precomp(im, wts, sched), weights))
    print(f"precomputed weights          : {(t_pre - t_floor)/K:8.1f} ms/img")


if __name__ == "__main__":
    main()
