"""Utility-layer smoke tests: logging, timers, collages, profiling, helpers."""

import os

import numpy as np

from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
from rapidobjectdetectionusingcascadedcnns_tpu.utils import (
    collage,
    file_handler,
    log,
    numbers,
    profiling,
)
from rapidobjectdetectionusingcascadedcnns_tpu.utils.time_watcher import TimeWatcher


class TestLog:
    def test_log_and_save(self, tmp_path):
        log.log_clear()
        log.set_echo(False)
        log.log("hello world")
        path = log.log_save(str(tmp_path), "sess", "unit")
        log.set_echo(True)
        content = open(path).read()
        assert "hello world" in content
        assert path.endswith("sess-unit.txt")


class TestTimeWatcher:
    def test_elapsed_and_format(self):
        tw = TimeWatcher("x", quiet=True)
        assert tw.stop() >= 0
        assert TimeWatcher.seconds_to_str(0.5).endswith("ms")
        assert TimeWatcher.seconds_to_str(65).startswith("1m")
        assert TimeWatcher.seconds_to_str(3700).startswith("1h")


class TestNumbers:
    def test_is_number(self):
        assert numbers.is_number(1)
        assert numbers.is_number("2.5")
        assert not numbers.is_number([0.5])
        assert not numbers.is_number("abc")


class TestFileHandler:
    def test_read_txt_lines(self, tmp_path):
        p = tmp_path / "x.txt"
        p.write_text("a\nb\n")
        assert file_handler.read_txt_lines(str(p)) == ["a", "b"]

    def test_fetch_url_graceful_offline(self):
        assert file_handler.fetch_url("http://192.0.2.1/x", timeout=0.2) is None


class TestCollage:
    def test_render_grid_shapes(self, rng):
        imgs = [rng.randint(0, 255, (8, 8, 3)).astype(np.uint8) for _ in range(5)]
        grid = collage.render_grid(imgs)
        assert grid.ndim == 3 and grid.shape[2] == 3

    def test_evaluation_collage_writes_file(self, tmp_path, rng):
        cf.set("project_extension_root", str(tmp_path))
        images = rng.randint(0, 255, (20, 8, 8, 3)).astype(np.uint8)
        labels = (np.arange(20) % 2).astype(np.int32)
        preds = ((np.arange(20) + 1) % 2).astype(np.int32)
        path = collage.evaluation_collage(images, labels, preds, "unit")
        assert os.path.exists(path)

    def test_class_distribution_collage(self, tmp_path, rng):
        cf.set("project_extension_root", str(tmp_path))
        images = rng.randint(0, 255, (10, 8, 8, 3)).astype(np.uint8)
        labels = (np.arange(10) % 2).astype(np.int32)
        assert os.path.exists(collage.class_distribution_collage(images, labels))


class TestProfiling:
    def test_phase_accumulation(self):
        profiling.reset()
        with profiling.phase("unit_phase"):
            pass
        with profiling.phase("unit_phase"):
            pass
        assert profiling.summary()["unit_phase"] >= 0
        profiling.log_summary()
        profiling.reset()
        assert profiling.summary() == {}


class TestMoreCollages:
    def test_partitioned_bundles(self, tmp_path, rng):
        cf.set("project_extension_root", str(tmp_path))
        bundles = {
            "a": rng.randint(0, 255, (6, 8, 8, 3)).astype(np.uint8),
            "b": rng.randint(0, 255, (4, 8, 8, 3)).astype(np.uint8),
        }
        assert os.path.exists(collage.partitioned_bundles_collage(bundles))


class TestDatasetStats:
    def test_log_stats_runs(self, rng):
        from rapidobjectdetectionusingcascadedcnns_tpu.data import dataset as ds_mod
        from rapidobjectdetectionusingcascadedcnns_tpu.data.preprocessor import (
            Preprocessor,
        )

        images = rng.randint(0, 255, (40, 4, 4, 3)).astype(np.uint8)
        labels = (np.arange(40) % 2).astype(np.int32)
        ds = ds_mod.Dataset(images, labels, [0.8, 0.1, 0.1], Preprocessor(None, False))
        ds.log_stats()  # must not raise
