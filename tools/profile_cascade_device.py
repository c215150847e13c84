"""True device-side cost of the full cascade program, bisected.

Wraps `_cascade_core` in a K-iteration lax.scan inside one jit (single
dispatch+fetch; per-iteration cost excludes the ~30 ms tunnel floor) and
times variants: device-NMS on/off, per-phase sub-programs.

Usage: python tools/profile_cascade_device.py [fddb|vga]
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

    cf.reset()
    cf.set("conv_filter_sizes", [32])
    cf.set("fc1_size", 512)
    cf.set("cascade_n_nets", 3)
    cf.set("img_width", 48)
    cf.set("window_scale_factor", wsf)
    cf.set("min_window_length", 0.075)

    @jax.jit
    def trivial(x):
        return x + 1.0

    t_floor = timeit(lambda: fetch(trivial(jnp.float32(1.0))))
    print(f"floor: {t_floor:.1f} ms")

    model = casc.build_cascade_model(seed=0)
    plan = build_plan(img_h, img_w, 12, 12, 0.075, wsf)
    table = window_table(plan)
    coords_norm = jnp.asarray(table["coords_norm"], jnp.int32)
    boxes_float = jnp.asarray(table["boxes_float"])
    n = plan.n_windows
    caps = tuple(casc.default_capacity_schedule(n, 3))
    print(f"{which}: {n} windows, caps {caps}")

    params = tuple(
        jax.tree_util.tree_map(jnp.asarray, p) for p in model.stage_params
    )
    stats = tuple(
        (jnp.asarray(m), jnp.asarray(s))
        for m, s in zip(model.stage_means, model.stage_stds)
    )
    cfgs = tuple(model.stage_configs)
    img = jnp.asarray(
        synthetic.make_scene(img_h, img_w, 3, seed=0, min_face=48, max_face=120).image,
        jnp.float32,
    )

    def scan_cascade(nms_mn, resample, label, caps_=None, chunk=16384,
                     compaction="rank", model_=None, thresholds=(0.5, 0.5, 0.5)):
        cc = caps_ or caps
        if model_ is not None:
            p_ = tuple(
                jax.tree_util.tree_map(jnp.asarray, p) for p in model_.stage_params
            )
            s_ = tuple(
                (jnp.asarray(m), jnp.asarray(s))
                for m, s in zip(model_.stage_means, model_.stage_stds)
            )
            c_ = tuple(model_.stage_configs)
        else:
            p_, s_, c_ = params, stats, cfgs

        @jax.jit
        def run(image):
            def step(carry, _):
                im = image.at[0, 0, 0].add(carry * 1e-30)
                out = casc._cascade_core(
                    im, coords_norm, boxes_float, p_, s_, plan, c_,
                    cc, "mult", thresholds, False, "crop", chunk,
                    nms_mn, resample, compaction,
                )
                return jnp.sum(out[1]), None

            out, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=K)
            return out

        t = timeit(lambda: fetch(run(img)))
        print(f"{label:34s}: {(t - t_floor)/K:8.1f} ms/img")

    scan_cascade(1, "pallas", "full cascade (pallas, dev-NMS)")
    scan_cascade(-1, "pallas", "full cascade (pallas, no NMS)")
    scan_cascade(1, "pallas2", "full cascade (pallas2, dev-NMS)")
    scan_cascade(-1, "xla", "full cascade (xla,    no NMS)")
    scan_cascade(1, "pallas2", "full cascade (pallas2, scan cmp)",
                 compaction="scan")
    scan_cascade(-1, "pallas2", "full (pallas2, no NMS, scan cmp)",
                 compaction="scan")

    # deployment-honest row: the TRAINED flagship at its shipped operating
    # threshold with capacities sized from its MEASURED survivors on this
    # image (the bench.py recipe: x1.5 headroom, 128-aligned; saturation
    # re-dispatch is the correctness net). The default-cap rows above are
    # the untrained worst case — a production cascade's stage-0 rejects
    # most windows, which is the whole point of the reference's design.
    try:
        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.abspath(__file__)))
        )
        import json as _json

        import train_flagship

        fmodel = train_flagship.load_flagship()
        ship_thr = 0.5
        ej = os.path.join(train_flagship.ARTIFACT_DIR, "flagship_eval.json")
        if os.path.exists(ej):
            with open(ej) as f:
                ship_thr = float(_json.load(f).get("threshold", 0.5))
    except Exception as exc:
        print(f"flagship artifact unavailable ({exc}); skipping trained rows")
        fmodel = None
    if fmodel is not None:
        cf.set("foreground_confidence_threshold", ship_thr)
        det = casc.CascadeDetector(fmodel)
        res = det.detect(np.asarray(img, np.uint8))
        surv = res.n_survivors_per_stage
        fcaps = tuple(
            ((int(s * 1.5) + 127) // 128) * 128 for s in surv[:-1]
        )
        print(f"flagship survivors at this density: {surv} -> caps {fcaps}")
        thr = (ship_thr,) * len(fmodel.stage_configs)
        scan_cascade(1, "pallas2", "flagship cascade (pallas2, dev-NMS)",
                     caps_=fcaps, compaction="scan", model_=fmodel,
                     thresholds=thr)
        scan_cascade(1, "pallas", "flagship cascade (pallas, dev-NMS)",
                     caps_=fcaps, compaction="scan", model_=fmodel,
                     thresholds=thr)

    # stage-0 only: extraction + CNN + threshold (no compaction/sort)
    def stage0_only(resample, label):
        @jax.jit
        def run(image):
            def step(carry, _):
                im = image.at[0, 0, 0].add(carry * 1e-30)
                probs0, bott = casc._apply_stage_on_boxes_chunked(
                    im, boxes_float, None, params[0], cfgs[0],
                    stats[0][0], stats[0][1], 16384, False, resample,
                )
                return jnp.sum(probs0) + jnp.sum(bott[:, 0]), None

            out, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=K)
            return out

        t = timeit(lambda: fetch(run(img)))
        print(f"{label:34s}: {(t - t_floor)/K:8.1f} ms/img")

    stage0_only("pallas", "stage0 extract+CNN (pallas)")
    stage0_only("xla", "stage0 extract+CNN (xla)")

    # compaction cost: argsort vs top_k over n windows
    pf = jnp.zeros((n,), jnp.float32)

    def sort_test(body, label):
        @jax.jit
        def run(p):
            def step(carry, _):
                pi = p.at[0].add(carry * 1e-30)
                return body(pi), None

            out, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=K)
            return out

        t = timeit(lambda: fetch(run(pf)))
        print(f"{label:34s}: {(t - t_floor)/K:8.1f} ms")

    sort_test(
        lambda p: jnp.sum(jnp.argsort(-p)[: caps[0]].astype(jnp.float32)),
        f"argsort {n} -> take {caps[0]}",
    )
    sort_test(
        lambda p: jnp.sum(jax.lax.top_k(p, caps[0])[1].astype(jnp.float32)),
        f"top_k   {n} -> {caps[0]}",
    )
    sort_test(
        lambda p: jnp.sum(
            casc._compact_indices(p > 0.0, p, caps[0], "scan")[0].astype(
                jnp.float32
            )
        ),
        f"scan-compact {n} -> {caps[0]}",
    )


if __name__ == "__main__":
    main()
