"""In-repo FDDB scorer: ellipse-rect IoU geometry, matching, ROC semantics.

Replaces the official Perl evaluator's scoring (absent from this
environment) with a tested reimplementation of its contract
(app/evaluate_fddb_app.py:171-179: detection-rate curve over false-positive
counts, discrete IoU>0.5 + continuous variants).
"""

import numpy as np
import pytest

from rapidobjectdetectionusingcascadedcnns_tpu.data import fddb, fddb_eval


class TestEllipseRectIoU:
    def test_circle_inside_its_bounding_box(self):
        # circle radius 20 inside its tight bbox: IoU == pi/4 (rasterized)
        ell = (20, 20, 0.0, 50, 50)
        rect = (30, 30, 40, 40)
        iou = fddb_eval.ellipse_rect_iou(ell, rect)
        assert iou == pytest.approx(np.pi / 4, abs=0.02)

    def test_disjoint_regions(self):
        assert fddb_eval.ellipse_rect_iou((10, 10, 0, 20, 20), (100, 100, 20, 20)) == 0.0

    def test_rect_inside_ellipse(self):
        # tiny rect fully inside a big circle: IoU = rect_area / circle_area
        ell = (50, 50, 0.0, 100, 100)
        rect = (95, 95, 10, 10)
        iou = fddb_eval.ellipse_rect_iou(ell, rect)
        assert iou == pytest.approx(100 / (np.pi * 50 * 50), rel=0.05)

    def test_rotation_matters(self):
        # a long thin ellipse vs a tall rect: aligned beats perpendicular
        rect = (90, 50, 20, 100)
        aligned = fddb_eval.ellipse_rect_iou((50, 10, np.pi / 2, 100, 100), rect)
        perp = fddb_eval.ellipse_rect_iou((50, 10, 0.0, 100, 100), rect)
        assert aligned > perp

    def test_matches_box_iou_for_box_like_ellipse(self):
        # sanity against the rectangle-IoU the rest of the repo uses: a huge
        # ellipse approximating a box should give a similar IoU to box-IoU
        from rapidobjectdetectionusingcascadedcnns_tpu.ops import rectangles

        box_a = np.array([30.0, 30.0, 70.0, 70.0])
        box_b = np.array([40.0, 40.0, 80.0, 80.0])
        box_iou = float(
            rectangles.iou_matrix(box_a[None], box_b[None])[0, 0]
        )
        # ellipse inscribed in box_a is smaller, so only rough agreement
        ell = fddb.boxes_to_ellipses(box_a[None])[0]
        iou = fddb_eval.ellipse_rect_iou(ell, (40, 40, 40, 40))
        assert abs(iou - box_iou) < 0.25


class TestMatchingAndRoc:
    def test_one_detection_per_annotation(self):
        # two GT faces, three detections: the weak duplicate on face 1 must
        # count as a false positive even though it overlaps
        ells = np.array([[20, 15, 0, 50, 50], [20, 15, 0, 150, 50]])
        boxes = np.array(
            [[35, 30, 30, 40], [135, 30, 30, 40], [38, 33, 30, 40]], float
        )
        scores = np.array([0.9, 0.8, 0.7])
        ss, disc, cont = fddb_eval.score_image(ells, boxes, scores)
        assert disc.tolist() == [1.0, 1.0, 0.0]
        assert cont[0] > 0.5 and cont[1] > 0.5
        # the duplicate's continuous credit is zero: its annotation was taken
        assert cont[2] == 0.0

    def test_roc_is_monotone_and_thresholded(self):
        ells = np.array([[20, 15, 0, 50, 50]])
        boxes = np.array([[35, 30, 30, 40], [300, 300, 30, 40]], float)
        scores = np.array([0.9, 0.4])
        triple = fddb_eval.score_image(ells, boxes, scores)
        points = fddb_eval.roc_curve([triple], n_faces_total=1)
        assert len(points) == 2
        # strongest-first: first point has the TP only, second adds the FP
        assert points[0]["true_positives"] == 1
        assert points[0]["false_positives"] == 0
        assert points[1]["false_positives"] == 1
        assert points[1]["detection_rate"] == 1.0
        assert points[0]["threshold"] > points[1]["threshold"]

    def test_evaluate_folds_end_to_end(self, tmp_path):
        """Synthetic corpus -> perfect detections == GT boxes -> detection
        rate 1.0 at 0 false positives; adding junk detections moves only the
        false-positive axis."""
        base = str(tmp_path / "fddb")
        img_base, folds_dir, truth = fddb.make_synthetic_corpus(
            base, n_folds=2, imgs_per_fold=2, seed=3
        )
        det_dir = str(tmp_path / "det")
        for fold_nr in (1, 2):
            keys = fddb.read_fold_keys_from(folds_dir, fold_nr)
            boxes = [truth[k] for k in keys]
            confs = [np.full((len(b),), 0.95) for b in boxes]
            fddb.write_fold_results(det_dir, fold_nr, keys, boxes, confs)
        res = fddb_eval.evaluate_folds(det_dir, folds_dir, n_folds=2)
        assert res["n_faces"] == res["n_detections"]
        last = res["roc"][-1]
        assert last["false_positives"] == 0
        assert last["detection_rate"] == 1.0
        assert last["detection_rate_continuous"] > 0.5

        # artifact writes + parses
        path = fddb_eval.write_roc_artifact(
            res, str(tmp_path / "artifacts" / "fddb_roc.json")
        )
        import json

        with open(path) as f:
            loaded = json.load(f)
        assert loaded["roc"][-1]["detection_rate"] == 1.0
