"""Headline benchmark: VGA frames/sec/chip, full-pyramid cascade detection.

BASELINE.json north star: >= 50 VGA frames/sec/chip on TPU v5e, full pyramid,
reference default config (12/24/48 cascade, conv [32], fc1 512,
window_scale_factor 1.1, min_window_length 0.075 —
/root/reference/config.py:84,92,249,316-322).

Two measurements, both reported:

  * **staged** (the headline, MLPerf-offline style): frames pre-staged in
    device HBM, then the batched cascade programs run back-to-back and every
    frame's packed result is fetched and host-postprocessed (NMS). This
    measures the CHIP's sustained detection rate — the metric the north star
    names — without conflating it with this environment's network tunnel
    (the chip is reached through a shared ~30-40 MB/s relay that a real
    deployment's PCIe/DMA path does not have).
  * **streaming**: end-to-end host->device->host including frame uploads
    through the tunnel, the round-1 methodology.

The headline value and ``vs_baseline`` use the MEDIAN of the staged runs
(round 1's best-of-N estimator is gone per the round-1 advisor finding); all
individual rates of both measurements are printed to stderr and echoed in
the JSON line for transparency.

Weights: a TRAINED flagship cascade artifact (artifacts/flagship/, built by
tools/train_flagship.py on the synthetic corpus) is used when present so
survivor distributions are realistic and a quality number accompanies the
throughput number; falls back to random init (device cost is
capacity-static, so fps is unaffected — the JSON records which was used).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

# Generous deadline for the liveness probe: a cold probe pays jax import +
# backend init + one tiny compile (~20-40 s normally; minutes when the
# remote-compile service is cold). Only a genuinely dead tunnel exceeds it.
PROBE_DEADLINE_S = int(os.environ.get("RODC_BENCH_PROBE_DEADLINE_S", "600"))
# Tunnel outages are transient (observed live 2026-08-19 and 2026-08-21:
# the remote side drops for 1-2 h and comes back). A bench run is the
# round's ONE recorded headline, so rather than failing on the first dead
# probe, retry the cheap probe across a recovery window and only then emit
# the error JSON. RODC_BENCH_PROBE_RETRY_WINDOW_S=0 restores fail-fast.
PROBE_RETRY_WINDOW_S = int(
    os.environ.get("RODC_BENCH_PROBE_RETRY_WINDOW_S", "3600")
)
PROBE_RETRY_INTERVAL_S = 120

_PROBE_SRC = (
    "import jax, jax.numpy as jnp;"
    "x = (jnp.ones((8, 8)) @ jnp.ones((8, 8)));"
    "print('probe-ok', jax.devices()[0].platform, float(x[0, 0]))"
)


def _backend_alive_with_retry() -> bool:
    """One full-deadline probe, then cheap retries across the recovery
    window (tunnel outages are transient — see PROBE_RETRY_WINDOW_S)."""
    if _backend_alive():
        return True
    t0 = time.time()
    while time.time() - t0 < PROBE_RETRY_WINDOW_S:
        sys.stderr.write(
            "tunnel probe failed; retrying for another {:.0f}s...\n".format(
                PROBE_RETRY_WINDOW_S - (time.time() - t0)
            )
        )
        time.sleep(PROBE_RETRY_INTERVAL_S)
        if _backend_alive(deadline_s=180):
            return True
    return False


def _backend_alive(deadline_s: int = None) -> bool:
    """Probe the accelerator in a SUBPROCESS with a hard deadline.

    The environment's TPU is reached through a stdio relay tunnel; when the
    remote side wedges, ``jax.devices()`` blocks forever inside a C call that
    no signal/thread can interrupt from within the process. Probing from a
    child process keeps the deadline enforceable: if the tunnel is dead the
    bench emits one explicit error JSON line and exits nonzero instead of
    hanging for the driver's whole bench window (observed live: relay wedge
    of 2026-08-19, ``jax.devices()`` blocked >45 min)."""
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            timeout=deadline_s or PROBE_DEADLINE_S,
        )
    except subprocess.TimeoutExpired:
        return False
    alive = proc.returncode == 0 and b"probe-ok" in proc.stdout
    if not alive:
        sys.stderr.write(proc.stdout.decode(errors="replace")[-2000:] + "\n")
    return alive


def main() -> None:
    if (
        os.environ.get("RODC_BENCH_NO_PROBE") != "1"
        and not _backend_alive_with_retry()
    ):
        sys.stderr.write(
            "FATAL: accelerator backend unreachable within {}s — the TPU "
            "tunnel is down; refusing to hang.\n".format(PROBE_DEADLINE_S)
        )
        print(
            json.dumps(
                {
                    "metric": "vga_frames_per_sec_per_chip",
                    "value": 0.0,
                    "unit": "frames/sec/chip",
                    "vs_baseline": 0.0,
                    "error": "backend unreachable (tunnel down) after {}s probe".format(
                        PROBE_DEADLINE_S
                    ),
                }
            )
        )
        raise SystemExit(1)

    import jax

    cache_dir = os.environ.get("RODC_JIT_CACHE", "/tmp/rodc_jit_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
    from rapidobjectdetectionusingcascadedcnns_tpu.data import synthetic
    from rapidobjectdetectionusingcascadedcnns_tpu.models import cascade as casc
    from rapidobjectdetectionusingcascadedcnns_tpu.ops.color import rgb_to_yuv420
    from rapidobjectdetectionusingcascadedcnns_tpu.utils import log as rodc_log

    rodc_log.set_echo(False)  # stdout must carry exactly one JSON line

    # reference default architecture & pyramid density
    cf.set("conv_filter_sizes", [32])
    cf.set("fc1_size", 512)
    cf.set("cascade_n_nets", 3)
    cf.set("img_width", 48)
    cf.set("window_scale_factor", 1.1)
    cf.set("min_window_length", 0.075)
    cf.set("foreground_confidence_threshold", 0.5)

    # trained flagship artifact when available (tools/train_flagship.py)
    weights = "random"
    quality = None
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
        import train_flagship

        model = train_flagship.load_flagship()
        if model is None and os.environ.get("RODC_BENCH_NO_TRAIN") != "1":
            # the trained artifact is machine-local (gitignored, ~200 MB) and
            # vanishes on environment resets — regenerate it from the
            # committed recipe (flagship_overrides.json + hard_negatives.npz)
            # rather than silently benching random weights
            sys.stderr.write(
                "flagship artifact missing; retraining via "
                "tools/train_flagship.py (~12 min, RODC_BENCH_NO_TRAIN=1 "
                "to skip)\n"
            )
            import subprocess

            proc = subprocess.run(
                [
                    sys.executable,
                    os.path.join(
                        os.path.dirname(os.path.abspath(__file__)),
                        "tools",
                        "train_flagship.py",
                    ),
                ],
                stdout=sys.stderr,
                stderr=subprocess.STDOUT,
                timeout=3600,
                check=False,
            )
            model = train_flagship.load_flagship()
            if proc.returncode != 0 or model is None:
                # make the silent-random-weights failure loud: stderr +
                # a distinct JSON weights marker (ADVICE r3)
                sys.stderr.write(
                    "WARNING: flagship retrain FAILED (exit {}); bench will "
                    "record weights='random (retrain failed)'\n".format(
                        proc.returncode
                    )
                )
                weights = "random (retrain failed)"
                model = None
        if model is not None:
            weights = "trained"
            eval_json = os.path.join(train_flagship.ARTIFACT_DIR, "flagship_eval.json")
            if os.path.exists(eval_json):
                with open(eval_json) as f:
                    quality = json.load(f)
    except Exception as exc:  # pragma: no cover - artifact probing
        sys.stderr.write("flagship artifact unavailable: {}\n".format(exc))
        model = None
    if model is None:
        model = casc.build_cascade_model(seed=0)

    # run at the flagship's SHIPPED operating threshold (the sweep picks the
    # best recall subject to the FP budget across a threshold curve — the
    # reference's own evaluation is threshold-swept, evaluate_fddb_app.py:
    # 171-179); falls back to the reference default 0.5 set above
    if quality and quality.get("threshold") is not None:
        cf.set("foreground_confidence_threshold", float(quality["threshold"]))
    if quality and quality.get("min_neighbors") is not None:
        # the shipped operating point carries BOTH inference knobs (round 5:
        # mn=0 keeps singleton clusters — +2.3 recall points for +0.06
        # FP/scene on the benchmark eval); bench NMS must match production
        cf.set("nms_opencv_min_neighbors", int(quality["min_neighbors"]))

    # production capacity tuning: size the survivor buffers from the trained
    # model's MEASURED survivor distribution (tools/train_flagship.py eval)
    # with 1.5x headroom — the documented deployment recipe; saturation
    # re-dispatch remains the correctness net if a frame exceeds them
    caps_source = "default"
    if quality and quality.get("survivors_max"):
        caps = train_flagship.capacity_schedule_from_quality(quality)
        cf.set("cascade_capacity_schedule", caps)
        caps_source = "measured_survivors_x1.5"

    detector = casc.CascadeDetector(model)

    n_scenes = 32
    scenes = [
        synthetic.make_scene(480, 640, n_faces=3, seed=s, min_face=48, max_face=120).image
        for s in range(n_scenes)
    ]
    # frames in YUV420 (native camera/video format, half the bytes of RGB24);
    # chroma->RGB conversion fuses into the device program (ops/color.py)
    yuv_scenes = [rgb_to_yuv420(s) for s in scenes]

    batch = int(cf.get("inference_batch_frames"))
    res = detector.detect_batch_yuv420([yuv_scenes[i % n_scenes] for i in range(batch)])[0]
    sys.stderr.write(
        "warmup: {} windows, survivors per stage {}, weights={}\n".format(
            res.n_windows, res.n_survivors_per_stage, weights
        )
    )

    # ---- staged measurement (headline) --------------------------------
    # pre-stage the frame batches in HBM, then run the batched cascade over
    # all of them and host-postprocess every frame's packed result
    import jax.numpy as jnp

    plan, table, coords_norm, boxes_float = detector._plan_and_table(480, 640)
    capacities = tuple(
        detector._capacity_override
        or casc.default_capacity_schedule(plan.n_windows, model.n_nets)
    )
    thresholds = tuple(casc.resolve_thresholds(model.n_nets))
    common = (
        coords_norm,
        boxes_float,
        detector._params_device,
        detector._stats_device,
        plan,
        tuple(model.stage_configs),
        capacities,
        cf.get("final_confidence_calculation"),
        thresholds,
        False,
        casc.resolve_extraction_mode(plan),
        int(cf.get("inference_chunk_size")),
        -1,
        casc.resolve_resample_impl(),
        casc.resolve_compaction(),
    )

    n_frames = 192
    ys_all = jax.device_put(
        jnp.asarray(np.stack([yuv_scenes[i % n_scenes][0] for i in range(n_frames)]))
    )
    uvs_all = jax.device_put(
        jnp.asarray(np.stack([yuv_scenes[i % n_scenes][1] for i in range(n_frames)]))
    )

    # ---- batch_frames sweep + result coalescing (VERDICT r4 #2) -------
    # the per-batch result fetch pays one tunnel round trip (~30 ms floor)
    # per batch; coalescing every batch's packed rows into ONE device-side
    # concat + a single fetch removes all but one round trip per rep, and
    # larger batches amortize the per-dispatch cost. Every rep runs one
    # UNRECORDED warmup first (VERDICT r4 #4: the r4 cold outlier sat
    # inside the median window).
    def run_staged(bs: int, n_reps: int = 5):
        views = [
            (
                jax.lax.slice_in_dim(ys_all, s, s + bs, axis=0),
                jax.lax.slice_in_dim(uvs_all, s, s + bs, axis=0),
            )
            for s in range(0, n_frames, bs)
        ]
        rates, phases = [], []
        for rep in range(n_reps + 1):  # rep 0 = warmup (compile + cache warm)
            t0 = time.perf_counter()
            packed = [
                casc._cascade_infer_device_batch_yuv(y, uv, *common)
                for (y, uv) in views
            ]
            t1 = time.perf_counter()
            rows = np.asarray(jnp.concatenate(packed, axis=0))
            t2 = time.perf_counter()
            for j in range(rows.shape[0]):
                detector._unpack_row(rows[j], capacities, plan, table, False, 480)
            t3 = time.perf_counter()
            if rep == 0:
                continue
            rates.append(n_frames / (t3 - t0))
            phases.append((t1 - t0, t2 - t1, t3 - t2))
        rates.sort()
        med = statistics.median(rates)
        ph = {
            "dispatch": round(statistics.median(p[0] for p in phases) / n_frames * 1e3, 3),
            "device_concat_fetch": round(
                statistics.median(p[1] for p in phases) / n_frames * 1e3, 3
            ),
            "host_nms_unpack": round(
                statistics.median(p[2] for p in phases) / n_frames * 1e3, 3
            ),
        }
        return rates, med, ph

    staged_sweep = {}
    for bs in (16, 32, 64):
        rates, med, ph = run_staged(bs)
        staged_sweep[bs] = {
            "staged_fps": [round(r, 1) for r in rates],
            "median": round(med, 2),
            "phases_ms_per_frame": ph,
        }
        sys.stderr.write(
            "staged bs={}: rates {} phases/frame {}\n".format(
                bs, [round(r, 1) for r in rates], ph
            )
        )

    # the r4 methodology (per-batch fetch at bs=16, no warmup discard) as a
    # directly comparable reference point for the coalescing win
    views16 = [
        (
            jax.lax.slice_in_dim(ys_all, s, s + batch, axis=0),
            jax.lax.slice_in_dim(uvs_all, s, s + batch, axis=0),
        )
        for s in range(0, n_frames, batch)
    ]
    perfetch_rates = []
    for rep in range(6):  # rep 0 = warmup
        t0 = time.perf_counter()
        packed = [
            casc._cascade_infer_device_batch_yuv(y, uv, *common) for (y, uv) in views16
        ]
        for p in packed:
            rows = np.asarray(p)
            for j in range(rows.shape[0]):
                detector._unpack_row(rows[j], capacities, plan, table, False, 480)
        if rep > 0:
            perfetch_rates.append(n_frames / (time.perf_counter() - t0))
    perfetch_rates.sort()
    sys.stderr.write(
        "staged per-batch-fetch (r4 method) rates: {}\n".format(
            [round(r, 1) for r in perfetch_rates]
        )
    )

    best_bs = max(staged_sweep, key=lambda b: staged_sweep[b]["median"])
    staged_rates = [
        float(r) for r in staged_sweep[best_bs]["staged_fps"]
    ]
    staged_median = staged_sweep[best_bs]["median"]
    staged_fetch = "device_concat_single_fetch"
    # round-5 measurement: per-batch fetches OVERLAP the next batch's device
    # work (async dispatch already pipelines — dispatch is ~0.03 ms/frame),
    # while the device-side concat + one big fetch SERIALIZES behind all
    # batches (353 vs 329 fps live). The headline takes whichever staged
    # methodology measured faster; both are recorded.
    perfetch_median = (
        statistics.median(perfetch_rates) if perfetch_rates else 0.0
    )
    if perfetch_median > staged_median:
        staged_median = perfetch_median
        staged_rates = [float(r) for r in perfetch_rates]
        staged_fetch = "per_batch_fetch_bs{}".format(batch)
    sys.stderr.write(
        "staged headline: {} median {:.1f} fps (sweep best bs={} {:.1f})\n".format(
            staged_fetch, staged_median, best_bs, staged_sweep[best_bs]["median"]
        )
    )

    # ---- streaming measurement (transparency) --------------------------
    stream = [yuv_scenes[i % n_scenes] for i in range(n_frames)]
    detector.detect_batch_yuv420(stream[: batch * 2])  # warmup (unrecorded)
    streaming_rates = []
    for _rep in range(4):
        t0 = time.perf_counter()
        detector.detect_batch_yuv420(stream)
        streaming_rates.append(n_frames / (time.perf_counter() - t0))
    streaming_rates.sort()
    sys.stderr.write("streaming rates: {}\n".format([round(r, 1) for r in streaming_rates]))

    # ---- phase decomposition (measures WHERE the streaming time goes) ---
    # upload (host->device ingress through the tunnel), device+fetch
    # (program execution + packed-result readback), host unpack (NMS etc.);
    # the staged-vs-streaming gap is thereby measured, not asserted
    bytes_per_frame = yuv_scenes[0][0].nbytes + yuv_scenes[0][1].nbytes
    n_batches = n_frames // batch
    phase_reps = []
    for _rep in range(3):
        t0 = time.perf_counter()
        staged_stream = []
        for b in range(n_batches):
            ys = np.stack([yuv_scenes[(b * batch + i) % n_scenes][0] for i in range(batch)])
            uvs = np.stack([yuv_scenes[(b * batch + i) % n_scenes][1] for i in range(batch)])
            staged_stream.append(
                (jax.device_put(jnp.asarray(ys)), jax.device_put(jnp.asarray(uvs)))
            )
        # force every transfer to finish: fetch one element per buffer
        # (block_until_ready does not reliably block through the tunnel)
        _probe = float(
            sum(jnp.sum(y[0, 0]) + jnp.sum(uv[0, 0, 0]) for y, uv in staged_stream)
        )
        t1 = time.perf_counter()
        rows_all = [
            np.asarray(casc._cascade_infer_device_batch_yuv(y, uv, *common))
            for (y, uv) in staged_stream
        ]
        t2 = time.perf_counter()
        for rows in rows_all:
            for j in range(rows.shape[0]):
                detector._unpack_row(rows[j], capacities, plan, table, False, 480)
        t3 = time.perf_counter()
        phase_reps.append((t1 - t0, t2 - t1, t3 - t2))
    upload_s = statistics.median(p[0] for p in phase_reps)
    device_s = statistics.median(p[1] for p in phase_reps)
    unpack_s = statistics.median(p[2] for p in phase_reps)
    sys.stderr.write(
        "phases per rep (s): upload {:.2f} / device+fetch {:.2f} / unpack {:.2f}; "
        "ingress {:.1f} MB at {:.1f} MB/s\n".format(
            upload_s, device_s, unpack_s,
            bytes_per_frame * n_frames / 1e6,
            bytes_per_frame * n_frames / upload_s / 1e6,
        )
    )

    # ---- RGB streaming comparison point -------------------------------
    # the streaming loop above ingests YUV420 (1.5 B/px); one RGB24 run
    # (3 B/px) quantifies what the YUV path buys on the ingress-bound
    # streaming rate (VERDICT r3 weak 7: make the format + the delta
    # recorded numbers, not an inference)
    rgb_stream = [scenes[i % n_scenes] for i in range(n_frames)]
    detector.detect_batch(rgb_stream[: batch * 2])  # warmup/compile (unrecorded)
    rgb_rates = []
    for _rep in range(2):
        t0 = time.perf_counter()
        detector.detect_batch(rgb_stream)
        rgb_rates.append(n_frames / (time.perf_counter() - t0))
    rgb_rates.sort()
    sys.stderr.write(
        "streaming rgb rates: {}\n".format([round(r, 1) for r in rgb_rates])
    )

    # ---- per-stage device accounting + MFU (VERDICT r3 item 6) --------
    # scan-in-jit probes (K iterations inside ONE dispatch; the per-call
    # tunnel floor is measured with a trivial program and subtracted) —
    # the floor-corrected methodology from tools/profile_cascade_device.py.
    # Analytic MXU FLOPs (convs + fcs over windows/capacities; extraction
    # einsums excluded) over the measured device time give a lower-bound
    # MFU against the v5e bf16 peak.
    stage_accounting = None
    if os.environ.get("RODC_BENCH_NO_STAGEPROBE") != "1":
        try:
            import math as _math

            import jax.numpy as jnp  # noqa: F811 (already imported above)

            K = 8
            img0 = jnp.asarray(scenes[0])
            params_d = detector._params_device
            stats_d = detector._stats_device
            extraction_mode = casc.resolve_extraction_mode(plan)
            resample_impl = casc.resolve_resample_impl()
            chunk_sz = int(cf.get("inference_chunk_size"))

            @jax.jit
            def probe_floor(x):
                def step(c, _):
                    return c + jnp.abs(x).sum() * 1e-9, 0.0
                return jax.lax.scan(step, 0.0, None, length=K)[0]

            @jax.jit
            def probe_full(image):
                def step(c, _):
                    # carry-dependent f32 input defeats loop-invariant
                    # hoisting (a u8 round-trip could fold back to const)
                    im = image.astype(jnp.float32).at[0, 0, 0].add(c * 1e-30)
                    outs = casc._cascade_core(
                        im, coords_norm, boxes_float, params_d, stats_d,
                        plan, tuple(model.stage_configs), capacities,
                        cf.get("final_confidence_calculation"), thresholds,
                        False, extraction_mode, chunk_sz, -1, resample_impl,
                        casc.resolve_compaction(),
                    )
                    acc = sum(jnp.abs(o.astype(jnp.float32)).sum() for o in outs)
                    return c + acc, 0.0
                return jax.lax.scan(step, 0.0, None, length=K)[0]

            @jax.jit
            def probe_stage0(image):
                def step(c, _):
                    im = image.astype(jnp.float32).at[0, 0, 0].add(c * 1e-30)
                    probs0, bneck, _ids, _valid = casc._stage0_apply(
                        im, boxes_float, plan,
                        params_d[0], model.stage_configs[0],
                        stats_d[0][0], stats_d[0][1], chunk_sz,
                        extraction_mode, resample_impl, False,
                    )
                    acc = jnp.abs(probs0).sum() + jnp.abs(bneck).sum()
                    return c + acc, 0.0
                return jax.lax.scan(step, 0.0, None, length=K)[0]

            def timed(fn, *args):
                float(np.asarray(fn(*args)))  # compile + warm
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(np.asarray(fn(*args)))
                    ts.append(time.perf_counter() - t0)
                return min(ts)

            floor_s = timed(probe_floor, jnp.ones((8, 8), jnp.float32))
            full_s = timed(probe_full, img0)
            s0_s = timed(probe_stage0, img0)
            full_ms = max(full_s - floor_s, 0.0) / K * 1e3
            s0_ms = max(s0_s - floor_s, 0.0) / K * 1e3
            later_ms = max(full_ms - s0_ms, 0.0)

            def _stage_flops(cfg, n_rows):
                hw, cin, f = cfg.input_size, 3, 0
                for cout in cfg.conv_filter_sizes:
                    f += hw * hw * cout * cin * cfg.conv_kernel ** 2 * 2
                    hw = _math.ceil(hw / cfg.conv_stride)
                    hw = _math.ceil(hw / cfg.pooling_stride)
                    cin = cout
                f += cfg.flat_features() * cfg.fc1_size * 2
                f += cfg.bottleneck_out_size * cfg.n_classes * 2
                return f * n_rows

            rows = [plan.n_windows] + list(capacities)
            flops_frame = sum(
                _stage_flops(c, n) for c, n in zip(model.stage_configs, rows)
            )
            peak = 197e12  # TPU v5e bf16 peak FLOP/s
            achieved = flops_frame / (full_ms / 1e3) if full_ms > 0 else 0.0
            stage_accounting = {
                "methodology": "K=8 lax.scan-in-jit per-frame probes, "
                               "trivial-program dispatch floor subtracted",
                "device_ms_per_frame_single": round(full_ms, 3),
                "stage0_ms": round(s0_ms, 3),
                "later_stages_ms": round(later_ms, 3),
                "model_mxu_gflops_per_frame": round(flops_frame / 1e9, 2),
                "achieved_model_tflops": round(achieved / 1e12, 3),
                "mfu_vs_v5e_bf16_peak": round(achieved / peak, 4),
                "note": "MFU counts model conv/fc FLOPs only (extraction "
                        "einsums excluded): tiny-CNN cascade detection is "
                        "latency/bandwidth-bound, not MXU-bound — the "
                        "roofline ceiling here is HBM + dispatch, which is "
                        "why capacities, fusion and batching (not more "
                        "FLOPs/s) set the fps",
            }
            sys.stderr.write(
                "stage accounting: full {:.2f} ms/frame (stage0 {:.2f} + "
                "later {:.2f}), model {:.1f} GFLOP/frame, MFU {:.2%}\n".format(
                    full_ms, s0_ms, later_ms, flops_frame / 1e9,
                    achieved / peak,
                )
            )
        except Exception as exc:  # pragma: no cover - probe is best-effort
            sys.stderr.write("stage accounting skipped: {}\n".format(exc))

    baseline_target = 50.0  # BASELINE.json north star (VGA fps/chip on v5e)
    ingress_mbps = bytes_per_frame * n_frames / upload_s / 1e6
    # link-normalized streaming figures (VERDICT r4 #4): the tunnel's
    # measured MB/s sets a hard frames/sec ceiling; reporting the measured
    # rate AS A FRACTION of that ceiling makes streaming comparable across
    # rounds even when the shared relay's bandwidth drifts (r3 44 MB/s vs
    # r4 16.3 MB/s halved the raw number with zero code change)
    link_bound_fps = ingress_mbps * 1e6 / bytes_per_frame
    streaming_median = statistics.median(streaming_rates)
    rgb_link_bound = ingress_mbps * 1e6 / scenes[0].nbytes
    out = {
        "metric": "vga_full_pyramid_cascade_fps_per_chip",
        "value": round(staged_median, 2),
        "unit": "frames/sec",
        "vs_baseline": round(staged_median / baseline_target, 3),
        "estimator": "median_of_5_staged_runs_after_1_warmup",
        "staged_methodologies_recorded": ["device_concat_single_fetch_sweep", "per_batch_fetch"],
        "staged_fps": [round(r, 1) for r in staged_rates],
        "staged_batch_frames": int(best_bs),
        "staged_fetch": staged_fetch,
        # per-batch-size medians + per-frame phase breakdown
        # (dispatch / device+concat+fetch / host NMS+unpack)
        "staged_sweep": {str(k): v for k, v in staged_sweep.items()},
        # the r4 methodology (bs=16, one fetch round-trip per batch) for
        # direct round-over-round comparison of the coalescing win
        "staged_fps_perbatch_fetch_bs16": [round(r, 1) for r in perfetch_rates],
        "streaming_fps": [round(r, 1) for r in streaming_rates],
        "streaming_fps_median": round(streaming_median, 2),
        "streaming_format": "yuv420 (1.5 B/px; ops/color.py fused chroma->RGB)",
        "streaming_link_bound_fps": round(link_bound_fps, 1),
        "streaming_fraction_of_link_bound": round(
            streaming_median / link_bound_fps, 3
        ),
        "streaming_rgb_fps": [round(r, 1) for r in rgb_rates],
        "streaming_rgb_fps_median": round(statistics.median(rgb_rates), 2),
        "streaming_rgb_link_bound_fps": round(rgb_link_bound, 1),
        "weights": weights,
        "capacities": list(capacities),
        "capacities_source": caps_source,
        # streaming-gap decomposition: per-frame phase costs and the
        # measured tunnel ingress throughput (bytes moved / upload time)
        "bytes_per_frame": int(bytes_per_frame),
        "phases_ms_per_frame": {
            "upload": round(upload_s / n_frames * 1e3, 2),
            "device_and_fetch": round(device_s / n_frames * 1e3, 2),
            "host_unpack": round(unpack_s / n_frames * 1e3, 2),
        },
        "ingress_MBps": round(ingress_mbps, 1),
    }
    if stage_accounting is not None:
        out["stage_accounting"] = stage_accounting
    if quality:
        # the flagship is promoted by recall-first operating-point ranking
        # (tools/sweep_flagship.py): the deep2 trunk benches ~16% below the
        # single-block trunk of earlier rounds (~425 fps) but lifts scene
        # recall 0.883 -> 0.963 — the conv-width sweep showed the recall
        # cannot be had cheaper (NOTES.md "Conv-width-at-fixed-recall")
        out["operating_point"] = "recall-first (see NOTES.md conv-width sweep)"
        out["quality"] = {
            "scene_recall": quality.get("recall"),
            "false_pos_per_scene": quality.get("false_pos_per_scene"),
            "n_scenes": quality.get("n_scenes"),
            "n_faces": quality.get("n_faces"),
            "threshold": quality.get("threshold"),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
