"""Per-op breakdown of the stage-0 CNN cost at pyramid density.

Times conv / pool / fc1 / full stage in isolation on the attached TPU to
find where the stage-0 CNN's wall-time goes (NOTES.md roadmap item 3:
45 ms at FDDB density, ~7% MXU).

Usage: python tools/profile_cnn.py [n_windows] [chunk]
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
    return float(np.asarray(jnp.sum(x)))


def timeit(fn, reps=5):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3, sorted(ts)[len(ts) // 2] * 1e3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 131903
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 16384

    cf.reset()
    cf.set("conv_filter_sizes", [32])
    cf.set("fc1_size", 512)
    cf.set("cascade_n_nets", 3)
    cf.set("img_width", 48)

    model = casc.build_cascade_model(seed=0)
    params0 = jax.tree_util.tree_map(jnp.asarray, model.stage_params[0])
    sc0 = model.stage_configs[0]
    n_chunks = -(-n // chunk)
    print(f"n={n} chunk={chunk} n_chunks={n_chunks} (padded {n_chunks*chunk})")
    cdt = sc0.compute_dtype

    wins = jnp.zeros((n_chunks, chunk, 12, 12, 3), cdt)
    Wc = params0["conv"][0]["W"].astype(cdt)
    bc = params0["conv"][0]["b"].astype(cdt)
    W1 = params0["fc1"]["W"].astype(cdt)
    b1 = params0["fc1"]["b"].astype(cdt)

    @jax.jit
    def conv_only(w):
        def one(wc):
            h = jax.lax.conv_general_dilated(
                wc, Wc, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            return jax.nn.relu(h + bc)

        return jnp.sum(jax.lax.map(one, w).astype(jnp.float32))

    t = timeit(lambda: fetch(conv_only(wins)))
    print(f"conv+relu            : min {t[0]:8.1f} ms  med {t[1]:8.1f} ms")

    conv_out = jnp.zeros((n_chunks, chunk, 12, 12, 32), cdt)

    @jax.jit
    def pool_only(h):
        def one(hc):
            return cnn._max_pool_same(hc, sc0.pooling_size, sc0.pooling_stride)

        return jnp.sum(jax.lax.map(one, h).astype(jnp.float32))

    t = timeit(lambda: fetch(pool_only(conv_out)))
    print(f"maxpool(3, s1)       : min {t[0]:8.1f} ms  med {t[1]:8.1f} ms")

    flat = jnp.zeros((n_chunks, chunk, 4608), cdt)

    @jax.jit
    def fc1_only(h):
        def one(hc):
            return jax.nn.relu(jnp.dot(hc, W1) + b1)

        return jnp.sum(jax.lax.map(one, h).astype(jnp.float32))

    t = timeit(lambda: fetch(fc1_only(flat)))
    print(f"fc1 4608->512        : min {t[0]:8.1f} ms  med {t[1]:8.1f} ms")

    # one giant fc1 GEMM, no lax.map chunking
    flat2 = jnp.zeros((n_chunks * chunk, 4608), cdt)

    @jax.jit
    def fc1_flat(h):
        return jnp.sum(jax.nn.relu(jnp.dot(h, W1) + b1).astype(jnp.float32))

    t = timeit(lambda: fetch(fc1_flat(flat2)))
    print(f"fc1 (single GEMM)    : min {t[0]:8.1f} ms  med {t[1]:8.1f} ms")

    mean0 = jnp.asarray(model.stage_means[0])
    std0 = jnp.asarray(model.stage_stds[0])
    winsf = jnp.zeros((n_chunks, chunk, 12, 12, 3), jnp.float32)

    @jax.jit
    def full_stage(w):
        def one(wc):
            out = cnn.apply_stage(params0, sc0, (wc - mean0) / std0)
            return out["probs"]

        return jnp.sum(jax.lax.map(one, w))

    t = timeit(lambda: fetch(full_stage(winsf)))
    print(f"full stage0          : min {t[0]:8.1f} ms  med {t[1]:8.1f} ms")

    # conv as dense matmul: (N, 432) @ (432, 4608) unrolled conv
    dense_W = jnp.zeros((432, 4608), cdt)
    flat_in = jnp.zeros((n_chunks * chunk, 432), cdt)

    @jax.jit
    def conv_dense(x):
        return jnp.sum(jax.nn.relu(jnp.dot(x, dense_W)).astype(jnp.float32))

    t = timeit(lambda: fetch(conv_dense(flat_in)))
    print(f"conv as dense GEMM   : min {t[0]:8.1f} ms  med {t[1]:8.1f} ms")

    # pool as max of 9 shifted slices on (N, 12, 12, 32)
    conv_flat = jnp.zeros((n_chunks * chunk, 12, 12, 32), cdt)

    @jax.jit
    def pool_slices(h):
        hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        m = None
        for dy in range(3):
            for dx in range(3):
                s = hp[:, dy : dy + 12, dx : dx + 12, :]
                m = s if m is None else jnp.maximum(m, s)
        return jnp.sum(m.astype(jnp.float32))

    t = timeit(lambda: fetch(pool_slices(conv_flat)))
    print(f"pool as 9 slices     : min {t[0]:8.1f} ms  med {t[1]:8.1f} ms")


if __name__ == "__main__":
    main()
