"""Cross-platform serving bundle: ONE artifact, executed on TPU *and* CPU.

Roadmap item: bundles exported with platforms=("tpu", "cpu") lower for both
platforms, but had only ever been *executed* on the platform they were
exported from. This tool closes the loop inside this single environment:

1. (parent, tunneled-TPU backend) export the trained flagship's cascade
   program with platforms=("tpu", "cpu"), save the bundle to disk, reload it
   and detect N synthetic scenes ON THE TPU;
2. (child subprocess, CPU backend, sanitized env) load the SAME on-disk
   bundle, regenerate the same scenes, detect ON CPU;
3. compare: per-scene detection boxes/confidences must agree (boxes to float
   rounding, confidences to a small cross-platform numeric tolerance — the
   program's bf16 matmuls execute on different units on the two platforms).

Writes artifacts/cross_platform_check.json. The CPU-only half (multi-platform
export loads + executes under the CPU backend) also runs in CI:
tests/test_serve.py::test_bundle_multi_platform_export.

Usage: python tools/cross_platform_bundle.py
"""

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

IMG_H, IMG_W = 240, 320
N_SCENES = 8
BATCH = 4
CAPS = [2048, 512]


def _scenes():
    from rapidobjectdetectionusingcascadedcnns_tpu.data import synthetic

    return [
        synthetic.make_scene(
            IMG_H, IMG_W, n_faces=2, seed=s, min_face=40, max_face=100
        ).image
        for s in range(N_SCENES)
    ]


def _detections_to_jsonable(results):
    return [
        {
            "boxes": [[float(v) for v in b] for b in r.boxes],
            "confidences": [float(c) for c in r.confidences],
        }
        for r in results
    ]


def _child(bundle_dir: str, out_path: str) -> None:
    from rapidobjectdetectionusingcascadedcnns_tpu import serve

    import jax

    det = serve.load_bundle(bundle_dir)
    t0 = time.perf_counter()
    results = det.detect_batch(_scenes())
    detect_s = time.perf_counter() - t0
    with open(out_path, "w") as f:
        json.dump(
            {
                "platform": jax.devices()[0].platform,
                "detect_s": detect_s,
                "detections": _detections_to_jsonable(results),
            },
            f,
        )


def main() -> int:
    import jax
    import numpy as np

    cache_dir = os.environ.get("RODC_JIT_CACHE", "/tmp/rodc_jit_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rapidobjectdetectionusingcascadedcnns_tpu import config as cf, serve

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import train_flagship

    cf.reset()
    model = train_flagship.load_flagship()
    assert model is not None, (
        "trained flagship artifact missing (machine-local, gitignored) — "
        "run `python tools/train_flagship.py` first, or use bench.py which "
        "auto-retrains"
    )
    with open(
        os.path.join(train_flagship.ARTIFACT_DIR, "flagship_eval.json")
    ) as f:
        quality = json.load(f)
    cf.set("foreground_confidence_threshold", float(quality["threshold"]))
    cf.set("nms_on_device", True)

    assert jax.devices()[0].platform == "tpu", (
        "run the parent under the tunneled-TPU backend (got {})".format(
            jax.devices()[0].platform
        )
    )

    t0 = time.perf_counter()
    bundle = serve.export_detector(
        model,
        IMG_H,
        IMG_W,
        batch=BATCH,
        capacities=CAPS,
        n_rungs=2,
        resample_impl="xla",
        platforms=("tpu", "cpu"),
    )
    export_s = time.perf_counter() - t0

    with tempfile.TemporaryDirectory() as d:
        bundle_dir = os.path.join(d, "bundle")
        serve.save_bundle(bundle, bundle_dir)
        bundle_bytes = sum(
            os.path.getsize(os.path.join(bundle_dir, f))
            for f in os.listdir(bundle_dir)
        )

        det = serve.load_bundle(bundle_dir)
        t0 = time.perf_counter()
        tpu_results = det.detect_batch(_scenes())
        tpu_detect_s = time.perf_counter() - t0
        tpu = _detections_to_jsonable(tpu_results)

        # child: CPU backend, tunneled-TPU site hook dropped (the same
        # sanitization the CPU test suite uses, tests/conftest.py)
        out_path = os.path.join(d, "cpu.json")
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = REPO
        env.pop("XLA_FLAGS", None)
        t0 = time.perf_counter()
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", bundle_dir, out_path],
            env=env,
            check=True,
            timeout=1800,
        )
        child_wall_s = time.perf_counter() - t0
        with open(out_path) as f:
            cpu_run = json.load(f)

    assert cpu_run["platform"] == "cpu", cpu_run["platform"]
    cpu = cpu_run["detections"]

    mismatch_scenes = []
    max_box_delta = 0.0
    max_conf_delta = 0.0
    for i, (a, b) in enumerate(zip(tpu, cpu)):
        if len(a["boxes"]) != len(b["boxes"]):
            mismatch_scenes.append(
                {"scene": i, "tpu_n": len(a["boxes"]), "cpu_n": len(b["boxes"])}
            )
            continue
        if a["boxes"]:
            # greedy order-insensitive matching: the two backends may emit
            # the same detection set in a different NMS order (ADVICE r3)
            ab = np.asarray(a["boxes"], float)
            bb = np.asarray(b["boxes"], float)
            ac = np.asarray(a["confidences"], float)
            bc = np.asarray(b["confidences"], float)
            unused = list(range(len(bb)))
            bd = 0.0
            cd = 0.0
            for j in range(len(ab)):
                dists = [np.abs(ab[j] - bb[k]).max() for k in unused]
                pick = int(np.argmin(dists))
                k = unused.pop(pick)
                bd = max(bd, float(dists[pick]))
                cd = max(cd, float(abs(ac[j] - bc[k])))
            max_box_delta = max(max_box_delta, bd)
            max_conf_delta = max(max_conf_delta, cd)
            if bd > 1.0 or cd > 0.05:
                mismatch_scenes.append(
                    {"scene": i, "box_delta": bd, "conf_delta": cd}
                )

    record = {
        "platforms": ["tpu", "cpu"],
        "img_hw": [IMG_H, IMG_W],
        "n_scenes": N_SCENES,
        "bundle_bytes": bundle_bytes,
        "export_s": round(export_s, 2),
        "tpu_detect_s": round(tpu_detect_s, 2),
        "cpu_detect_s": round(cpu_run["detect_s"], 2),
        "cpu_child_wall_s": round(child_wall_s, 2),
        "n_detections_per_scene_tpu": [len(r["boxes"]) for r in tpu],
        "max_box_delta": max_box_delta,
        "max_conf_delta": max_conf_delta,
        "mismatch_scenes": mismatch_scenes,
        "ok": not mismatch_scenes,
    }
    out = os.path.join(REPO, "artifacts", "cross_platform_check.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))
    return 0 if record["ok"] else 1


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _child(sys.argv[2], sys.argv[3])
    else:
        sys.exit(main())
