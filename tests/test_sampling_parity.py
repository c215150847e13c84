"""Offline sampling parity with the reference flow (run_sampling.py:60-186):
plain background images keep feeding the presampled pool, Haar-detected
faces restrict background sampling, annotation crops count toward the
per-image quota."""

import os

import numpy as np
import pytest

import run_sampling
from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
from rapidobjectdetectionusingcascadedcnns_tpu.data.synthetic import (
    draw_background,
    draw_face,
)
from rapidobjectdetectionusingcascadedcnns_tpu.ops import sampling


@pytest.fixture
def native_corpus(tmp_path):
    from PIL import Image

    root = tmp_path / "native"
    fg = root / "testset" / "foreground"
    bg = root / "testset" / "background"
    fg.mkdir(parents=True)
    bg.mkdir(parents=True)
    rs = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray(draw_face(rs, 64)).save(fg / "face_{}.png".format(i))
    for i in range(4):
        Image.fromarray(draw_background(rs, 64)).save(bg / "bg_{}.png".format(i))
    cf.set("project_extension_root", str(tmp_path))
    cf.set("project_extension_root_fast", str(tmp_path))
    cf.set("dataset_native_path_root", str(root))
    cf.set("dataset_path_root", str(root))
    cf.set("dataset_keys", ["testset"])
    cf.set("class_min_images", None)
    cf.set("class_max_images", None)
    cf.set("sampling_multiplier", 5)
    cf.set("img_width", 12)
    return root


class TestSampleImageReference:
    def test_background_image_samples_unconditionally(self, rng):
        img = np.zeros((64, 64, 3), np.uint8)
        cf.set("sampling_multiplier", 4)
        crops, bg = sampling.sample_image_reference(
            img, np.zeros((0, 4)), is_foreground=False, min_patch_size=12, rng=rng
        )
        assert crops == []
        assert len(bg) == 4  # the round-1 `continue` dropped these entirely

    def test_foreground_without_restrictions_yields_no_backgrounds(self, rng):
        """reference run_sampling.py:127: fg images sample backgrounds only
        when restrictions exist (else any patch may contain the object)."""
        img = np.zeros((64, 64, 3), np.uint8)
        crops, bg = sampling.sample_image_reference(
            img, np.zeros((0, 4)), is_foreground=True, min_patch_size=12, rng=rng
        )
        assert crops == [] and bg == []

    def test_annotation_crops_count_toward_quota(self, rng):
        img = np.zeros((64, 64, 3), np.uint8)
        cf.set("sampling_multiplier", 4)
        boxes = np.array([[0, 0, 20, 20], [30, 30, 50, 50]], np.float64)
        crops, bg = sampling.sample_image_reference(
            img, boxes, is_foreground=True, min_patch_size=12, rng=rng
        )
        assert len(crops) == 2
        assert len(crops) + len(bg) <= 4  # quota includes the crops

    def test_detected_faces_restrict_but_are_not_emitted(self, rng):
        from rapidobjectdetectionusingcascadedcnns_tpu.ops import rectangles as R

        img = np.zeros((100, 100, 3), np.uint8)
        cf.set("sampling_multiplier", 8)
        cf.set("sampling_background_max_iou_with_foreground", 0.05)
        detected = np.array([[0, 0, 60, 60]], np.float64)
        # background image + a detected face: patches must avoid it
        crops, bg = sampling.sample_image_reference(
            img, np.zeros((0, 4)), is_foreground=False, min_patch_size=12,
            rng=rng, detected_boxes=detected,
        )
        assert crops == []  # detections are never emitted as samples
        assert len(bg) > 0

    def test_detection_covering_everything_deadlocks_to_zero(self, rng):
        img = np.zeros((30, 30, 3), np.uint8)
        detected = np.array([[0, 0, 30, 30]], np.float64)
        crops, bg = sampling.sample_image_reference(
            img, np.zeros((0, 4)), is_foreground=False, min_patch_size=12,
            rng=rng, detected_boxes=detected,
        )
        assert bg == []


class TestRunSamplingMain:
    def test_presampled_tree_contents(self, native_corpus):
        out_root = cf.get("dataset_presampled_path_root")
        calls = []

        def fake_detector(img):
            calls.append(img.shape)
            return np.zeros((0, 4), np.float64)

        run_sampling.main(face_detector=fake_detector)

        bg_dir = os.path.join(out_root, "testset", "background")
        files = sorted(os.listdir(bg_dir)) if os.path.isdir(bg_dir) else []
        # 4 background images x sampling_multiplier(5) patches (minus any
        # rejection-sampling deadlocks, which these textures don't trigger)
        assert len(files) == 20, files
        assert all(f.startswith("aug_") for f in files)
        # the detector ran over every native image (fg and bg, reference
        # run_sampling.py:114-122)
        assert len(calls) == 7
        # foreground images have no annotations in this fixture -> no crops
        fg_dir = os.path.join(out_root, "testset", "foreground")
        assert not os.path.isdir(fg_dir) or os.listdir(fg_dir) == []

    def test_detector_restrictions_apply(self, native_corpus):
        out_root = cf.get("dataset_presampled_path_root")
        cf.set("sampling_background_max_iou_with_foreground", 0.05)
        # large min patch: any proposal on a 64px image overlaps the detected
        # box with IoU >= (48/64)^2 >> 0.05 (like the reference, a SMALL
        # patch inside a big detection passes the IoU gate — IoU is area
        # ratio, utils/img_manipulation.py:11-72)
        cf.set("img_width", 48)

        def block_everything(img):
            h, w = img.shape[0], img.shape[1]
            return np.array([[0, 0, w, h]], np.float64)

        run_sampling.main(face_detector=block_everything)
        bg_dir = os.path.join(out_root, "testset", "background")
        files = os.listdir(bg_dir) if os.path.isdir(bg_dir) else []
        assert files == []  # every patch proposal collides with the "face"

    def test_falls_back_without_objdetect(self, native_corpus):
        """This image's cv2 has no objdetect: the detector chain falls back
        to the in-repo Viola-Jones evaluator (ops/viola_jones.py) when a
        cascade XML is findable, or to annotations-only when not — main()
        must run either way."""
        from rapidobjectdetectionusingcascadedcnns_tpu.ops import viola_jones

        det = sampling.make_haar_face_detector()
        have_xml = viola_jones.default_cascade_path() is not None
        assert (det is not None) == have_xml
        run_sampling.main()
        out_root = cf.get("dataset_presampled_path_root")
        bg_dir = os.path.join(out_root, "testset", "background")
        n = len(os.listdir(bg_dir))
        if have_xml:
            # the live detector shifts which patch proposals survive; the
            # restriction semantics themselves are pinned by the
            # fake-detector tests above
            assert n >= 15
        else:
            assert n == 20
