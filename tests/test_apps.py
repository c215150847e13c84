"""App-layer end-to-end smoke tests (milestones M2/M3 scaffolding):
train -> export -> reload -> detect -> visualize -> FDDB export -> runtime
bench, all hermetic on synthetic data."""

import os

import numpy as np
import pytest

from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
from rapidobjectdetectionusingcascadedcnns_tpu.apps.evaluate_runtime import (
    EvaluateRuntimeApp,
)
from rapidobjectdetectionusingcascadedcnns_tpu.apps.inference_apps import (
    InferenceApp,
    InferenceCascadeApp,
)
from rapidobjectdetectionusingcascadedcnns_tpu.apps.train_apps import (
    TrainApp,
    TrainCascadeApp,
)
from rapidobjectdetectionusingcascadedcnns_tpu.apps.visualizer import (
    InferenceVisualizerApp,
    draw_detections,
)
from rapidobjectdetectionusingcascadedcnns_tpu.data.synthetic import make_scene
from rapidobjectdetectionusingcascadedcnns_tpu.train.cascade_trainer import (
    SyntheticProvider,
)


def _fast_config(tmp_path):
    cf.set("project_extension_root", str(tmp_path))
    cf.set("project_extension_root_fast", str(tmp_path))
    cf.set("conv_filter_sizes", [8])
    cf.set("fc1_size", 32)
    cf.set("batch_size", 64)
    cf.set("max_batch_size", 256)
    cf.set("epochs_total", 2)
    cf.set("compute_dtype", "float32")
    cf.set("data_augmentation_online", False)
    cf.set("optimizer", cf.OPTIMIZER_ADAM)
    cf.set("learning_rate_init", 0.003)
    cf.set("dropout_rate", 1.0)
    cf.set("n_max_constant_evals", None)
    cf.set("max_beta", 4)
    cf.set("dataset_keys", ["synthetic"])
    cf.set("inference_batch_frames", 4)


@pytest.fixture(scope="module")
def trained_cascade_app(tmp_path_factory):
    # module-scoped: one training serves every downstream app test
    tmp_path = tmp_path_factory.mktemp("cascade_home")
    _fast_config(tmp_path)
    cf.set("cascade_n_nets", 2)
    cf.set("img_width", 24)
    provider = SyntheticProvider(60, 180, [12, 24], seed=3)
    return TrainCascadeApp(provider=provider)


class TestTrainApps:
    def test_train_single_exports_model(self, tmp_path):
        _fast_config(tmp_path)
        cf.set("img_width", 12)
        provider = SyntheticProvider(50, 50, [12], seed=1)
        app = TrainApp(provider=provider)
        assert os.path.exists(app.exported_path)
        assert app.final_results["valid"]["accuracy"] > 0

    def test_train_cascade_then_reload_and_detect(self, trained_cascade_app, tmp_path):
        app = trained_cascade_app
        assert app.model.n_nets == 2
        # reload from exported artifacts by session key, like production
        infer = InferenceCascadeApp(model_session_key=cf.get("session_key"))
        scene = make_scene(100, 120, n_faces=1, seed=5, min_face=40, max_face=60)
        results = infer.run_inference_on_images([scene.image])
        assert len(results) == 1
        assert results[0].n_windows > 0

    def test_single_inference_app_reload(self, tmp_path):
        _fast_config(tmp_path)
        cf.set("img_width", 12)
        provider = SyntheticProvider(50, 50, [12], seed=2)
        TrainApp(provider=provider)
        infer = InferenceApp(model_session_key=cf.get("session_key"))
        scene = make_scene(100, 120, n_faces=1, seed=7, min_face=40, max_face=50)
        results = infer.run_inference_on_images([scene.image])
        assert len(results) == 1
        # patch classification path
        patches = np.zeros((4, 12, 12, 3), np.uint8)
        probs = infer.run_inference_on_raw_data(patches)
        assert probs.shape == (4,)


class TestDetectionQuality:
    def test_trained_cascade_finds_synthetic_faces(self, tmp_path):
        """M2-style check: a cascade trained on synthetic faces detects them
        in scenes (IoU>=0.3 with ground truth for most faces)."""
        _fast_config(tmp_path)
        cf.set("cascade_n_nets", 2)
        cf.set("img_width", 24)
        cf.set("epochs_total", 5)
        # beta low enough that stage 0 actually discriminates on the
        # background-dominated corpus (a constant-foreground stage 0 would
        # make the whole cascade depend on stage 1 alone)
        cf.set("max_beta", 2)
        provider = SyntheticProvider(150, 400, [12, 24], seed=11)
        app = TrainCascadeApp(provider=provider)
        infer = InferenceCascadeApp(model=app.model)
        cf.set("nms_opencv_min_neighbors", 0)

        from rapidobjectdetectionusingcascadedcnns_tpu.ops import rectangles as R

        hits = total = 0
        for seed in range(4):
            scene = make_scene(100, 120, n_faces=1, seed=seed, min_face=45, max_face=60)
            res = infer.run_inference_on_images([scene.image])[0]
            for gt in scene.boxes:
                total += 1
                if len(res.boxes):
                    ious = R.iou(np.asarray(res.boxes), gt[None, :])
                    if np.max(ious) >= 0.3:
                        hits += 1
        assert total > 0
        assert hits / total >= 0.5, (hits, total)


class TestVisualizer:
    def test_draw_detections(self):
        img = np.zeros((50, 60, 3), np.uint8)
        out = draw_detections(img, np.array([[5, 5, 20, 20]]), np.array([0.8]))
        assert out.shape == img.shape
        assert out.sum() > 0
        assert img.sum() == 0  # original untouched

    def test_visualizer_app_saves_files(self, trained_cascade_app, tmp_path):
        infer = InferenceCascadeApp(model=trained_cascade_app.model)
        scene = make_scene(100, 120, n_faces=1, seed=9, min_face=40, max_face=60)
        vis = InferenceVisualizerApp(infer, [scene.image])
        assert len(vis.saved_paths) == 1
        assert os.path.exists(vis.saved_paths[0])


class TestEvaluateRuntime:
    def test_runtime_comparison(self, tmp_path, trained_cascade_app):
        _fast_config(tmp_path)
        cf.set("img_width", 12)
        provider = SyntheticProvider(40, 40, [12], seed=4)
        single = TrainApp(provider=provider)
        from rapidobjectdetectionusingcascadedcnns_tpu.models.single import (
            SingleNetDetector,
        )

        detector = SingleNetDetector(
            single.trainer.state.params,
            single.trainer.stage_config,
            *single.trainer.mean_std(),
        )
        images = [
            make_scene(100, 120, 1, seed=s, min_face=40, max_face=50).image
            for s in range(3)
        ]
        app = EvaluateRuntimeApp(
            images=images,
            cascade_model=trained_cascade_app.model,
            single_detector=detector,
        )
        assert "cascade" in app.results and "single" in app.results
        assert app.results["cascade"]["fps"] > 0
        assert app.results["single"]["fps"] > 0

    def test_platform_comparison_axis(self, tmp_path, trained_cascade_app):
        """The reference's GPU-vs-CPU axis (evaluate_runtime_app.py:50-55):
        per-platform re-benchmarking via utils/device.force_platform. On the
        CPU test backend the axis degenerates to cpu-only, which still
        exercises the backend re-init + host-param rebuild path."""
        _fast_config(tmp_path)
        images = [
            make_scene(80, 80, 1, seed=s, min_face=40, max_face=50).image
            for s in range(2)
        ]
        provider = SyntheticProvider(40, 40, [12], seed=4)
        cf.set("img_width", 12)
        single = TrainApp(provider=provider)
        from rapidobjectdetectionusingcascadedcnns_tpu.models.single import (
            SingleNetDetector,
        )

        detector = SingleNetDetector(
            single.trainer.state.params,
            single.trainer.stage_config,
            *single.trainer.mean_std(),
        )
        app = EvaluateRuntimeApp(
            images=images,
            cascade_model=trained_cascade_app.model,
            single_detector=detector,
            compare_platforms=["cpu"],
        )
        assert "cascade@cpu" in app.results and "single@cpu" in app.results
        assert app.results["cascade@cpu"]["fps"] > 0
        assert "speedup_cascade_vs_single@cpu" in app.results


class TestFDDBApp:
    def test_fddb_export_with_synthetic_folds(self, trained_cascade_app, tmp_path):
        from PIL import Image

        from rapidobjectdetectionusingcascadedcnns_tpu.apps.evaluate_fddb import (
            EvaluateFDDBApp,
        )

        # synthetic FDDB tree: 1 fold with 2 images
        img_base = tmp_path / "fddb_images"
        folds = tmp_path / "folds"
        folds.mkdir()
        (img_base / "2002" / "07").mkdir(parents=True)
        keys = ["2002/07/img_1", "2002/07/img_2"]
        for i, key in enumerate(keys):
            scene = make_scene(100, 120, 1, seed=20 + i, min_face=40, max_face=55)
            Image.fromarray(scene.image).save(str(img_base / (key + ".jpg")))
        with open(folds / "FDDB-fold-01.txt", "w") as f:
            f.write("\n".join(keys) + "\n")

        cf.set("fddb_folds_dir", str(folds))
        cf.set("fddb_img_base_dir", str(img_base))
        cf.set("fddb_detection_output_dir", str(tmp_path / "fddb_out"))
        cf.set(
            "fddb_latest_detection_output_dir", str(tmp_path / "fddb_out" / "latest")
        )
        cf.set("fddb_per_evaluation_script_path", str(tmp_path / "missing.pl"))

        app = EvaluateFDDBApp(
            model=trained_cascade_app.model, n_folds=1, run_now=False
        )
        # dense FDDB pyramid config was applied (evaluate_fddb_app.py:32-41)
        assert cf.get("window_scale_factor") == 1.005
        assert cf.get("vertically_enlarge_bboxes") is True
        # ...but run the actual fold with a coarse pyramid: the CPU test
        # would otherwise compile a ~500-scale program
        cf.set("window_scale_factor", 1.25)
        app.run()
        assert len(app.fold_paths) == 1
        content = open(app.fold_paths[0]).read().strip().split("\n")
        assert content[0] == keys[0]
        assert os.path.islink(cf.get("fddb_latest_detection_output_dir"))
