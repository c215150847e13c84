"""Separate the tunnel latency floor from true device compute.

Runs each candidate op K times inside ONE jitted lax.scan (single
dispatch+fetch), so per-iteration cost = (wall - floor) / K.

Usage: python tools/profile_floor.py
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
from rapidobjectdetectionusingcascadedcnns_tpu.models import cascade as casc
from rapidobjectdetectionusingcascadedcnns_tpu.models import cnn


def fetch(x):
    return float(np.asarray(x))


def timeit(fn, reps=5):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    # 1. latency floor: trivial scalar op
    @jax.jit
    def trivial(x):
        return x + 1.0

    t_floor = timeit(lambda: fetch(trivial(jnp.float32(1.0))))
    print(f"latency floor (scalar roundtrip): {t_floor:.1f} ms")

    cf.reset()
    cf.set("conv_filter_sizes", [32])
    cf.set("fc1_size", 512)
    cf.set("cascade_n_nets", 3)
    cf.set("img_width", 48)

    model = casc.build_cascade_model(seed=0)
    params0 = jax.tree_util.tree_map(jnp.asarray, model.stage_params[0])
    sc0 = model.stage_configs[0]
    cdt = sc0.compute_dtype
    n = 147456
    K = 8

    W1 = params0["fc1"]["W"].astype(cdt)

    def scan_op(body, init_x):
        # each iteration perturbs one input element with the carry so XLA
        # cannot hoist the body out of the scan (dus of 1 element ~ free)
        @jax.jit
        def run(x):
            def step(carry, _):
                idx = (0,) * x.ndim
                xi = x.at[idx].add((carry * 1e-30).astype(x.dtype))
                y = body(xi)
                return y, None

            out, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=K)
            return out

        return run

    # fc1 GEMM
    flat = jnp.zeros((n, 4608), cdt)
    run = scan_op(lambda x: jnp.sum(jnp.dot(x, W1).astype(jnp.float32)), flat)
    t = timeit(lambda: fetch(run(flat)))
    gflop = 2 * n * 4608 * 512 / 1e9
    per = (t - t_floor) / K
    print(f"fc1 GEMM ({gflop:.0f} GF): {per:8.2f} ms/iter -> {gflop/per:.0f} TF/s")

    # conv
    wins = jnp.zeros((n, 12, 12, 3), cdt)
    Wc = params0["conv"][0]["W"].astype(cdt)

    def conv_body(x):
        h = jax.lax.conv_general_dilated(
            x, Wc, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return jnp.sum(h.astype(jnp.float32))

    run = scan_op(conv_body, wins)
    t = timeit(lambda: fetch(run(wins)))
    gflop = 2 * n * 144 * 27 * 32 / 1e9
    per = (t - t_floor) / K
    print(f"conv ({gflop:.0f} GF)    : {per:8.2f} ms/iter -> {gflop/per:.1f} TF/s")

    # pool (9-slice formulation)
    conv_out = jnp.zeros((n, 12, 12, 32), cdt)

    def pool_body(h):
        hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=0.0)
        m = None
        for dy in range(3):
            for dx in range(3):
                s = hp[:, dy : dy + 12, dx : dx + 12, :]
                m = s if m is None else jnp.maximum(m, s)
        return jnp.sum(m.astype(jnp.float32))

    run = scan_op(pool_body, conv_out)
    t = timeit(lambda: fetch(run(conv_out)))
    per = (t - t_floor) / K
    print(f"pool 9-slice        : {per:8.2f} ms/iter")

    # reduce_window pool
    def pool_rw(h):
        return jnp.sum(cnn._max_pool_same(h, 3, 1).astype(jnp.float32))

    run = scan_op(pool_rw, conv_out)
    t = timeit(lambda: fetch(run(conv_out)))
    per = (t - t_floor) / K
    print(f"pool reduce_window  : {per:8.2f} ms/iter")

    # full stage0 (chunked like the real path)
    mean0 = jnp.asarray(model.stage_means[0])
    std0 = jnp.asarray(model.stage_stds[0])
    chunk = 16384
    winsf = jnp.zeros((n // chunk, chunk, 12, 12, 3), jnp.float32)

    def full_body(w):
        def one(wc):
            out = cnn.apply_stage(params0, sc0, (wc - mean0) / std0)
            return out["probs"]

        return jnp.sum(jax.lax.map(one, w))

    run = scan_op(full_body, winsf)
    t = timeit(lambda: fetch(run(winsf)))
    per = (t - t_floor) / K
    print(f"full stage0 chunked : {per:8.2f} ms/iter")

    # full stage0 single batch, no chunking
    winsf2 = jnp.zeros((n, 12, 12, 3), jnp.float32)

    def full_flat(w):
        out = cnn.apply_stage(params0, sc0, (w - mean0) / std0)
        return jnp.sum(out["probs"])

    run = scan_op(full_flat, winsf2)
    t = timeit(lambda: fetch(run(winsf2)))
    per = (t - t_floor) / K
    print(f"full stage0 flat    : {per:8.2f} ms/iter")


if __name__ == "__main__" and not os.environ.get("RODC_PROFILE_EXTRA"):
    main()


def extra():
    cf.reset()
    cf.set("conv_filter_sizes", [32])
    cf.set("fc1_size", 512)
    cf.set("cascade_n_nets", 3)
    cf.set("img_width", 48)
    model = casc.build_cascade_model(seed=0)
    params0 = jax.tree_util.tree_map(jnp.asarray, model.stage_params[0])
    sc0 = model.stage_configs[0]
    cdt = sc0.compute_dtype
    n = 147456
    K = 8

    @jax.jit
    def trivial(x):
        return x + 1.0

    t_floor = timeit(lambda: fetch(trivial(jnp.float32(1.0))))
    print(f"floor: {t_floor:.1f} ms")

    def scan_op(body, init_x):
        @jax.jit
        def run(x):
            def step(carry, _):
                idx = (0,) * x.ndim
                xi = x.at[idx].add((carry * 1e-30).astype(x.dtype))
                y = body(xi)
                return y, None

            out, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=K)
            return out

        return run

    conv_out = jnp.zeros((n, 12, 12, 32), cdt)

    def pool_sep(h):
        # separable: 3-tap max over rows, then cols (SAME, stride 1)
        hp = jnp.pad(h, ((0, 0), (1, 1), (0, 0), (0, 0)), constant_values=0.0)
        v = jnp.maximum(jnp.maximum(hp[:, :-2], hp[:, 1:-1]), hp[:, 2:])
        vp = jnp.pad(v, ((0, 0), (0, 0), (1, 1), (0, 0)), constant_values=0.0)
        m = jnp.maximum(jnp.maximum(vp[:, :, :-2], vp[:, :, 1:-1]), vp[:, :, 2:])
        return jnp.sum(m.astype(jnp.float32))

    run = scan_op(pool_sep, conv_out)
    t = timeit(lambda: fetch(run(conv_out)))
    print(f"pool separable      : {(t - t_floor)/K:8.2f} ms/iter")

    # full stage0 with separable pool spliced in
    mean0 = jnp.asarray(model.stage_means[0])
    std0 = jnp.asarray(model.stage_stds[0])
    Wc = params0["conv"][0]["W"].astype(cdt)
    bc = params0["conv"][0]["b"].astype(cdt)
    W1 = params0["fc1"]["W"].astype(cdt)
    b1 = params0["fc1"]["b"].astype(cdt)
    W2 = params0["fc2"]["W"].astype(cdt)
    b2 = params0["fc2"]["b"]
    winsf = jnp.zeros((n, 12, 12, 3), jnp.float32)

    def full_sep(w):
        h = ((w - mean0) / std0).astype(cdt)
        h = jax.lax.conv_general_dilated(
            h, Wc, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        h = jax.nn.relu(h + bc)
        hp = jnp.pad(h, ((0, 0), (1, 1), (0, 0), (0, 0)), constant_values=0.0)
        v = jnp.maximum(jnp.maximum(hp[:, :-2], hp[:, 1:-1]), hp[:, 2:])
        vp = jnp.pad(v, ((0, 0), (0, 0), (1, 1), (0, 0)), constant_values=0.0)
        m = jnp.maximum(jnp.maximum(vp[:, :, :-2], vp[:, :, 1:-1]), vp[:, :, 2:])
        h = m.reshape(m.shape[0], -1)
        fc1 = jax.nn.relu(jnp.dot(h, W1) + b1)
        logits = jnp.dot(fc1, W2).astype(jnp.float32) + b2
        return jnp.sum(jax.nn.softmax(logits))

    run = scan_op(full_sep, winsf)
    t = timeit(lambda: fetch(run(winsf)))
    print(f"full stage0 sep-pool: {(t - t_floor)/K:8.2f} ms/iter")


if __name__ == "__main__" and os.environ.get("RODC_PROFILE_EXTRA"):
    extra()
