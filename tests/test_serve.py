"""AOT serving bundles: exported programs == live detector, config-free.

The bundle is the TPU-native analog of the reference's frozen-graph export
(network/inference_optimizer.py:1-96): weights baked into a serialized
StableHLO artifact served without the model object or config.
"""

import numpy as np

from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
from rapidobjectdetectionusingcascadedcnns_tpu import serve
from rapidobjectdetectionusingcascadedcnns_tpu.data import synthetic
from rapidobjectdetectionusingcascadedcnns_tpu.models import cascade
from rapidobjectdetectionusingcascadedcnns_tpu.ops import color


def _tiny_config():
    cf.set("conv_filter_sizes", [8])
    cf.set("fc1_size", 32)
    cf.set("compute_dtype", "float32")
    cf.set("nms", cf.NMS_OPENCV)
    cf.set("nms_opencv_min_neighbors", 1)
    cf.set("nms_on_device", True)
    cf.set("inference_batch_frames", 2)


def _assert_same_results(a, b):
    np.testing.assert_array_equal(a.raw_window_ids, b.raw_window_ids)
    np.testing.assert_array_equal(a.raw_boxes, b.raw_boxes)
    np.testing.assert_allclose(a.raw_confidences, b.raw_confidences, atol=1e-6)
    np.testing.assert_allclose(a.boxes, b.boxes, atol=1e-6)
    np.testing.assert_allclose(a.confidences, b.confidences, atol=1e-6)
    assert a.n_survivors_per_stage == b.n_survivors_per_stage


def test_bundle_roundtrip_matches_live_detector(tmp_path):
    _tiny_config()
    model = cascade.build_cascade_model(seed=0)
    frames = [
        synthetic.make_scene(100, 120, n_faces=1, seed=s, min_face=40, max_face=60).image
        for s in range(3)
    ]

    # untrained nets keep ~half the windows: pin generous capacities on both
    # sides so neither saturates (saturation parity has its own test below)
    caps = [1024, 512]
    det = cascade.CascadeDetector(model, capacity_schedule=caps)
    live = det.detect_batch(frames)

    bundle = serve.export_detector(model, 100, 120, batch=2, capacities=caps, n_rungs=1)
    serve.save_bundle(bundle, str(tmp_path / "bundle"))
    served_det = serve.load_bundle(str(tmp_path / "bundle"))

    # the serving host must not depend on config: poison every knob the
    # program/unpack could possibly read before detecting
    cf.set("foreground_confidence_threshold", 0.99)
    cf.set("nms_opencv_min_neighbors", 5)
    cf.set("vertically_enlarge_bboxes", True)
    cf.set("nms_on_device", False)

    served = served_det.detect_batch(frames)
    for a, b in zip(live, served):
        _assert_same_results(a, b)


def test_bundle_yuv_matches_live_detector(tmp_path):
    _tiny_config()
    model = cascade.build_cascade_model(seed=1)
    rgb = synthetic.make_scene(64, 64, n_faces=1, seed=7, min_face=40, max_face=50).image
    frame = color.rgb_to_yuv420(rgb)

    caps = [1024, 512]
    det = cascade.CascadeDetector(model, capacity_schedule=caps)
    live = det.detect_batch_yuv420([frame])[0]

    bundle = serve.export_detector(
        model, 64, 64, batch=1, yuv=True, capacities=caps, n_rungs=1
    )
    serve.save_bundle(bundle, str(tmp_path / "bundle"))
    served = serve.load_bundle(str(tmp_path / "bundle")).detect(frame)
    _assert_same_results(live, served)


def test_bundle_capacity_ladder_matches_redispatch(tmp_path):
    # an untrained cascade keeps far more than 8 survivors: the live detector
    # re-dispatches with doubled capacities, the bundle walks its rungs — the
    # two must land on identical detections
    _tiny_config()
    model = cascade.build_cascade_model(seed=0)
    frame = synthetic.make_scene(
        100, 120, n_faces=1, seed=3, min_face=40, max_face=60
    ).image

    det = cascade.CascadeDetector(model, capacity_schedule=[8, 8])
    live = det.detect(frame)

    bundle = serve.export_detector(
        model, 100, 120, batch=1, capacities=[8, 8], n_rungs=4
    )
    assert len(bundle.meta["capacity_rungs"]) > 1  # the ladder really exists
    serve.save_bundle(bundle, str(tmp_path / "bundle"))
    served = serve.load_bundle(str(tmp_path / "bundle")).detect(frame)
    _assert_same_results(live, served)
    # the final result must not be saturated (the ladder absorbed it)
    caps_top = bundle.meta["capacity_rungs"][-1]
    assert not any(
        s > c for s, c in zip(served.n_survivors_per_stage, caps_top)
    )


def test_bundle_multi_platform_export(tmp_path):
    # platforms=("cpu", "tpu") lowers ONE artifact for both platforms
    # (jax.export cross-platform lowering) — it must load and execute
    # wherever one of the named platforms is present (here: the CPU
    # backend) with detections identical to the live detector. The
    # TPU-side execution of the same artifact is validated on hardware by
    # tools/cross_platform_bundle.py (artifacts/cross_platform_check.json).
    _tiny_config()
    model = cascade.build_cascade_model(seed=0)
    frames = [
        synthetic.make_scene(100, 120, n_faces=1, seed=s, min_face=40, max_face=60).image
        for s in range(2)
    ]
    caps = [1024, 512]
    det = cascade.CascadeDetector(model, capacity_schedule=caps)
    live = det.detect_batch(frames)

    bundle = serve.export_detector(
        model, 100, 120, batch=2, capacities=caps, n_rungs=1,
        platforms=("cpu", "tpu"),
    )
    assert bundle.meta["platforms"] == ["cpu", "tpu"]
    serve.save_bundle(bundle, str(tmp_path / "bundle"))
    served_det = serve.load_bundle(str(tmp_path / "bundle"))
    assert served_det.meta["platforms"] == ["cpu", "tpu"]
    served = served_det.detect_batch(frames)
    for a, b in zip(live, served):
        _assert_same_results(a, b)


def test_bundle_dynamic_batch(tmp_path):
    # symbolic batch dim: one program, any frame count, no padding; the
    # saturation ladder re-runs single frames. Must equal the live detector
    # (which re-dispatches with doubled capacities) frame for frame.
    _tiny_config()
    model = cascade.build_cascade_model(seed=0)
    frames = [
        synthetic.make_scene(100, 120, n_faces=1, seed=s, min_face=40, max_face=60).image
        for s in range(3)
    ]
    det = cascade.CascadeDetector(model, capacity_schedule=[8, 8])
    live = det.detect_batch(frames)

    bundle = serve.export_detector(
        model, 100, 120, batch="dynamic", capacities=[8, 8], n_rungs=4
    )
    assert bundle.meta["batch"] == "dynamic"
    assert bundle.meta["chunk_hint"] == 2  # inference_batch_frames above
    serve.save_bundle(bundle, str(tmp_path / "bundle"))
    served = serve.load_bundle(str(tmp_path / "bundle")).detect_batch(frames)
    for a, b in zip(live, served):
        _assert_same_results(a, b)


def test_bundle_mesh_sharded(tmp_path):
    # frame-sharded export over the 8-device CPU mesh: the bundle records the
    # device count, serves with a matching mesh, and detections equal the
    # single-device live detector frame for frame
    from rapidobjectdetectionusingcascadedcnns_tpu.parallel import mesh as mesh_mod

    _tiny_config()
    model = cascade.build_cascade_model(seed=0)
    frames = [
        synthetic.make_scene(100, 120, n_faces=1, seed=s, min_face=40, max_face=60).image
        for s in range(10)
    ]
    caps = [1024, 512]
    det = cascade.CascadeDetector(model, capacity_schedule=caps)
    live = det.detect_batch(frames)

    m = mesh_mod.get_mesh(8)
    bundle = serve.export_detector(
        model, 100, 120, batch=8, capacities=caps, n_rungs=1, mesh=m
    )
    assert bundle.meta["nr_devices"] == 8
    serve.save_bundle(bundle, str(tmp_path / "bundle"))

    try:
        serve.load_bundle(str(tmp_path / "bundle"))
        assert False, "expected a mesh-required error"
    except ValueError as e:
        assert "frame-sharded" in str(e)

    served = serve.load_bundle(str(tmp_path / "bundle"), mesh=m).detect_batch(frames)
    for a, b in zip(live, served):
        _assert_same_results(a, b)


def test_bundle_window_sharded(tmp_path):
    # the huge-pyramid serving mode: one image's WINDOW axis sharded over the
    # 8-device mesh, exported as an artifact — detections must equal both the
    # live window-sharded path and the single-device detector
    from rapidobjectdetectionusingcascadedcnns_tpu.parallel import (
        mesh as mesh_mod,
        window_shard,
    )

    _tiny_config()
    cf.set("nms_on_device", False)
    cf.set("window_extraction_mode", "crop")
    model = cascade.build_cascade_model(seed=0)
    scene = synthetic.make_scene(100, 120, n_faces=1, seed=3, min_face=40, max_face=60)
    caps = [1024, 512]
    m = mesh_mod.get_mesh(8)

    det = cascade.CascadeDetector(model, capacity_schedule=caps)
    single = det.detect(scene.image)
    live_sharded = window_shard.detect_window_sharded(det, scene.image, m)

    bundle = serve.export_window_sharded(
        model, 100, 120, m, capacities=caps, n_rungs=1
    )
    assert bundle.meta["kind"] == "window_sharded"
    serve.save_bundle(bundle, str(tmp_path / "bundle"))
    served = serve.load_bundle(str(tmp_path / "bundle"), mesh=m).detect(scene.image)

    assert sorted(map(tuple, served.raw_boxes.tolist())) == sorted(
        map(tuple, single.raw_boxes.tolist())
    )
    assert served.n_survivors_per_stage == live_sharded.n_survivors_per_stage
    np.testing.assert_allclose(
        np.sort(served.boxes, axis=0), np.sort(single.boxes, axis=0), atol=1e-6
    )


def test_run_export_serving_cli(tmp_path):
    # checkpoint -> run_export_serving.py subprocess -> loadable bundle
    import os
    import subprocess
    import sys

    from rapidobjectdetectionusingcascadedcnns_tpu.train import checkpoint

    _tiny_config()
    model = cascade.build_cascade_model(seed=0)
    checkpoint.save_cascade(str(tmp_path), "sess", model)
    out_dir = tmp_path / "bundle"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    env["PYTHONPATH"] = os.pathsep.join([repo, env.get("PYTHONPATH", "")])
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "run_export_serving.py"),
            str(tmp_path),
            "sess",
            str(out_dir),
            "--height", "64", "--width", "64", "--batch", "1", "--rungs", "2",
            "--platform", "cpu",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    served_det = serve.load_bundle(str(out_dir))
    assert len(served_det.programs) == 2
    frame = synthetic.make_scene(64, 64, n_faces=1, seed=2, min_face=30, max_face=40).image
    res = served_det.detect(frame)
    assert res.n_windows > 0
    assert res.raw_boxes.shape[1] == 4


def test_bundle_rejects_format_version_mismatch(tmp_path):
    import json
    import os

    _tiny_config()
    model = cascade.build_cascade_model(seed=0)
    bundle = serve.export_detector(model, 64, 64, batch=1, n_rungs=1)
    d = str(tmp_path / "bundle")
    serve.save_bundle(bundle, d)
    meta_path = os.path.join(d, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    meta["format_version"] = 99
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    try:
        serve.load_bundle(d)
        assert False, "expected a format-version error"
    except ValueError as e:
        assert "unsupported bundle format" in str(e)


def test_bundle_rejects_wrong_shape(tmp_path):
    _tiny_config()
    model = cascade.build_cascade_model(seed=0)
    bundle = serve.export_detector(model, 64, 64, batch=1, n_rungs=1)
    serve.save_bundle(bundle, str(tmp_path / "bundle"))
    served_det = serve.load_bundle(str(tmp_path / "bundle"))
    bad = np.zeros((80, 64, 3), np.uint8)
    try:
        served_det.detect(bad)
        assert False, "expected a shape error"
    except ValueError as e:
        assert "exported program" in str(e)
