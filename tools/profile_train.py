"""Training-step throughput on the attached TPU.

Measures the fused train step (standardize + augment + forward + loss +
backward + optimizer update, train/train_step.py) in samples/sec for the
cascade stages' architectures, floor-corrected via the K-iteration scan
harness (chained optimizer state forces sequential steps).

Usage: python tools/profile_train.py
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
from rapidobjectdetectionusingcascadedcnns_tpu.models import cnn
from rapidobjectdetectionusingcascadedcnns_tpu.ops import augment as augment_ops
from rapidobjectdetectionusingcascadedcnns_tpu.train import optimizer as opt_mod
from rapidobjectdetectionusingcascadedcnns_tpu.train import train_step as ts

K = 8


def fetch(x):
    return float(np.asarray(x))


def timeit(fn, reps=5):
    fn()
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        out.append(time.perf_counter() - t0)
    return min(out) * 1e3


def main():
    cf.reset()
    cf.set("conv_filter_sizes", [32])
    cf.set("fc1_size", 512)

    @jax.jit
    def trivial(x):
        return x + 1.0

    t_floor = timeit(lambda: fetch(trivial(jnp.float32(1.0))))
    print(f"floor: {t_floor:.1f} ms")

    batch = int(cf.get("batch_size"))
    rng = np.random.RandomState(0)

    for size, aug in ((12, False), (24, False), (48, False), (48, True)):
        scfg = cnn.StageConfig.from_config(size)
        tx = opt_mod.optimizer_from_config(1000)
        state = ts.init_train_state(jax.random.PRNGKey(0), scfg, tx)
        settings = ts.LossSettings(
            f_beta=1.0, positive_proportion=0.5, weighted=True,
            normalize=True, l2_strength=0.0, l1_strength=0.0,
            dropout_keep=1.0,
        )
        aug_cfg = augment_ops.AugmentConfig.from_config() if aug else None
        step_fn = ts.make_train_step(scfg, tx, settings, aug_cfg)
        mean = jnp.zeros((size, size, 3), jnp.float32)
        std = jnp.ones((size, size, 3), jnp.float32)
        x = jnp.asarray(
            rng.randint(0, 256, size=(batch, size, size, 3)).astype(np.uint8)
        )
        y = jnp.asarray((rng.rand(batch) < 0.5).astype(np.int32))
        dummy_b = jnp.zeros((batch, 1), jnp.float32)

        @jax.jit
        def run(state, x, y):
            def body(carry, i):
                st = carry
                st2, loss = step_fn(
                    st, x, y, dummy_b, mean, std,
                    jax.random.fold_in(jax.random.PRNGKey(1), i),
                )
                return st2, loss

            st, losses_ = jax.lax.scan(body, state, jnp.arange(K))
            return jnp.sum(losses_)

        t = timeit(lambda: fetch(run(state, x, y)))
        per = (t - t_floor) / K
        label = f"stage {size}x{size}" + (" +aug" if aug else "     ")
        print(
            f"{label}: {per:7.2f} ms/step  "
            f"{batch / per * 1e3:10.0f} samples/sec  (batch {batch})"
        )


if __name__ == "__main__":
    main()
