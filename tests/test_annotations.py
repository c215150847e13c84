"""AFLW sqlite annotation loading + annotated-dataset assembly."""

import os
import sqlite3

import numpy as np
import pytest

from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
from rapidobjectdetectionusingcascadedcnns_tpu.data import annotations as ann_mod


@pytest.fixture
def aflw_db(tmp_path):
    """Minimal aflw.sqlite with the FaceImages/Faces/FaceRect schema the
    reference queries (data/annotation.py:84-98)."""
    path = str(tmp_path / "aflw.sqlite")
    conn = sqlite3.connect(path)
    conn.executescript(
        """
        CREATE TABLE FaceImages (file_id TEXT, filepath TEXT);
        CREATE TABLE Faces (face_id INTEGER, file_id TEXT);
        CREATE TABLE FaceRect (face_id INTEGER, x INTEGER, y INTEGER,
                               w INTEGER, h INTEGER);
        INSERT INTO FaceImages VALUES ('f1', 'flickr/0/image001.jpg');
        INSERT INTO FaceImages VALUES ('f2', 'flickr/2/image002.jpg');
        INSERT INTO Faces VALUES (1, 'f1');
        INSERT INTO Faces VALUES (2, 'f1');
        INSERT INTO Faces VALUES (3, 'f2');
        INSERT INTO FaceRect VALUES (1, 10, 20, 30, 40);
        INSERT INTO FaceRect VALUES (2, 100, 110, 50, 50);
        INSERT INTO FaceRect VALUES (3, 5, 5, 25, 25);
        """
    )
    conn.commit()
    conn.close()
    ann_mod.reset_cache()
    yield path
    ann_mod.reset_cache()


def test_load_aflw_annotations(aflw_db):
    anns = ann_mod.load_aflw_annotations(aflw_db)
    assert set(anns.keys()) == {"image001.jpg", "image002.jpg"}
    boxes = sorted(a.bbox.tolist() for a in anns["image001.jpg"])
    # (x, y, w, h) -> (xmin, ymin, xmax, ymax)
    assert boxes == [[10, 20, 40, 60], [100, 110, 150, 160]]
    a = anns["image002.jpg"][0]
    assert (a.xmin, a.ymin, a.xmax, a.ymax) == (5, 5, 30, 30)


def test_get_annotations_via_config(aflw_db, tmp_path, monkeypatch):
    # point the configured dataset root at the db location
    root = tmp_path
    (root / "aflw").mkdir(exist_ok=True)
    os.replace(aflw_db, str(root / "aflw" / "aflw.sqlite"))
    cf.set("dataset_path_root", str(root))
    cf.set("dataset_keys_annotated", ["aflw"])
    anns = ann_mod.get_annotations("/some/dir/image001.jpg", "aflw")
    assert len(anns) == 2
    # unannotated dataset keys return nothing
    assert ann_mod.get_annotations("/some/dir/image001.jpg", "imagenet") == []


def test_missing_db_is_empty(tmp_path):
    assert ann_mod.load_aflw_annotations(str(tmp_path / "nope.sqlite")) == {}


def test_saturation_warning(rng):
    """A stage that keeps everything must surface the capacity truncation."""
    from rapidobjectdetectionusingcascadedcnns_tpu.data import synthetic
    from rapidobjectdetectionusingcascadedcnns_tpu.models import cascade
    from rapidobjectdetectionusingcascadedcnns_tpu.utils import log

    cf.set("conv_filter_sizes", [8])
    cf.set("fc1_size", 32)
    cf.set("compute_dtype", "float32")
    cf.set("foreground_confidence_threshold", 0.0)  # keep everything
    cf.set("nms", cf.NMS_DISABLED)
    model = cascade.build_cascade_model(seed=0)
    det = cascade.CascadeDetector(model)
    scene = synthetic.make_scene(100, 100, 1, seed=3, min_face=40, max_face=60)
    log.log_clear()
    log.set_echo(False)
    det.detect(scene.image)
    log.set_echo(True)
    assert any("saturated its survivor capacity" in line for line in log.log_lines())
