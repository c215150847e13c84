"""Host data layer: file lists, cache, loader, sampling, FDDB IO."""

import os

import numpy as np
import pytest

from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
from rapidobjectdetectionusingcascadedcnns_tpu.data import cache as cache_mod
from rapidobjectdetectionusingcascadedcnns_tpu.data import fddb
from rapidobjectdetectionusingcascadedcnns_tpu.data.file_list import (
    FileListLoader,
    load_list,
    save_list,
)
from rapidobjectdetectionusingcascadedcnns_tpu.data.loader import DiskDatasetProvider
from rapidobjectdetectionusingcascadedcnns_tpu.data.preprocessor import Preprocessor
from rapidobjectdetectionusingcascadedcnns_tpu.data.synthetic import (
    draw_background,
    draw_face,
)
from rapidobjectdetectionusingcascadedcnns_tpu.ops import sampling


@pytest.fixture
def corpus(tmp_path, rng):
    """A tiny on-disk dataset tree: testset/{foreground,background}/*.png."""
    from PIL import Image

    root = tmp_path / "input"
    fg = root / "testset" / "foreground"
    bg = root / "testset" / "background"
    fg.mkdir(parents=True)
    bg.mkdir(parents=True)
    rs = np.random.RandomState(0)
    for i in range(12):
        Image.fromarray(draw_face(rs, 32)).save(fg / "face_{}.png".format(i))
    for i in range(16):
        Image.fromarray(draw_background(rs, 32)).save(bg / "bg_{}.png".format(i))
    # set the roots first: they re-derive dataset_path_root
    cf.set("project_extension_root", str(tmp_path))
    cf.set("project_extension_root_fast", str(tmp_path))
    cf.set("dataset_path_root", str(root))
    cf.set("dataset_keys", ["testset"])
    cf.set("class_min_images", None)
    cf.set("class_max_images", None)
    return root


class TestFileList:
    def test_discovery_and_labels(self, corpus):
        loader = FileListLoader()
        infos = loader.image_infos
        assert len(infos) == 28
        n_fg = sum(1 for i in infos if i.label.iid == 1)
        assert n_fg == 12

    def test_class_max_subsample(self, corpus):
        cf.set("class_max_images", 5)
        infos = FileListLoader().image_infos
        assert sum(1 for i in infos if i.label.iid == 1) == 5
        assert sum(1 for i in infos if i.label.iid == 0) == 5

    def test_sample_image_infos(self, corpus):
        sample = FileListLoader().sample_image_infos(3, 2)
        assert sum(1 for i in sample if i.label.iid == 1) == 3
        assert sum(1 for i in sample if i.label.iid == 0) == 2

    def test_ignore_list(self, corpus):
        loader = FileListLoader()
        victim = loader.image_infos[0].path_original
        save_list(cf.get("ignore_lists_dir"), "testset", [victim])
        loader2 = FileListLoader()
        assert victim not in [i.path_original for i in loader2.image_infos]
        assert load_list(cf.get("ignore_lists_dir"), "testset") == [victim]

    def test_broken_image_scan(self, corpus):
        bad = os.path.join(str(corpus), "testset", "background", "broken.png")
        with open(bad, "wb") as f:
            f.write(b"not an image")
        loader = FileListLoader()
        broken = loader.remove_broken_images()
        assert bad in broken
        assert bad not in [i.path_original for i in loader.image_infos]


class TestDiskProvider:
    def test_dataset_assembly_and_alignment(self, corpus):
        cf.set("cache_dataset", False)
        provider = DiskDatasetProvider()
        ds12 = provider.dataset(12)
        ds24 = provider.dataset(24)
        assert ds12.images.shape[1:] == (12, 12, 3)
        assert ds24.images.shape[1:] == (24, 24, 3)
        # identical sample order across resolutions (cascade invariant)
        np.testing.assert_array_equal(ds12.labels, ds24.labels)

    def test_dataset_cache_roundtrip(self, corpus):
        cf.set("cache_dataset", True)
        provider = DiskDatasetProvider()
        ds1 = provider.dataset(12)
        assert cache_mod.dataset_cached("testset", 12, 12)
        ds2 = DiskDatasetProvider().dataset(12)
        np.testing.assert_array_equal(ds1.images, ds2.images)
        np.testing.assert_array_equal(ds1.labels, ds2.labels)

    def test_background_filter(self, corpus):
        cf.set("cache_dataset", False)
        cf.set("filter_dataset_after_caching", True)

        def reject_all_backgrounds(images):
            return np.ones((len(images),))  # every sample "looks foreground"

        ds = DiskDatasetProvider(background_filter=reject_all_backgrounds).dataset(12)
        assert (ds.labels == 1).all()


class TestCacheGeneric:
    def test_generic_store(self, corpus):
        cache_mod.save("unit", "key1", {"a": 1})
        assert cache_mod.load("unit", "key1") == {"a": 1}
        assert cache_mod.load("unit", "missing", default=42) == 42


class TestSampling:
    def test_random_patch_avoids_restricted(self, rng):
        img = np.zeros((100, 100, 3), np.uint8)
        restricted = np.array([[0, 0, 60, 60]], np.float64)
        for _ in range(10):
            patch, box = sampling.random_img_patch(img, restricted, 0.05, 12, rng)
            from rapidobjectdetectionusingcascadedcnns_tpu.ops import rectangles as R

            iou = max(float(R.iou(box, restricted[0])), 0.0)
            assert iou <= 0.05
            assert patch.shape[0] == patch.shape[1] >= 12

    def test_deadlock_detection(self, rng):
        img = np.zeros((30, 30, 3), np.uint8)
        restricted = np.array([[0, 0, 30, 30]], np.float64)  # everything blocked
        with pytest.raises(sampling.PotentialDeadlockError):
            sampling.random_img_patch(img, restricted, 0.0, 20, rng, max_tries=20)

    def test_sample_image(self, rng):
        img = np.zeros((200, 200, 3), np.uint8)
        boxes = np.array([[10, 10, 60, 60]], np.float64)
        cf.set("sampling_multiplier", 5)
        fg, bg = sampling.sample_image(img, boxes, 12, rng)
        assert len(fg) == 1
        assert fg[0].shape == (50, 50, 3)
        assert 0 < len(bg) <= 5


class TestFDDBFormat:
    def test_format_fold_results(self):
        boxes = [np.array([[10, 20, 60, 80]])]
        confs = [np.array([0.9])]
        text = fddb.format_fold_results(["2002/07/img_1"], boxes, confs)
        lines = text.strip().split("\n")
        assert lines[0] == "2002/07/img_1"
        assert lines[1] == "1"
        assert lines[2] == "10 20 50 60 0.9"

    def test_write_and_read_fold(self, tmp_path):
        cf.set("fddb_folds_dir", str(tmp_path))
        with open(tmp_path / "FDDB-fold-01.txt", "w") as f:
            f.write("2002/07/img_1\n2002/08/img_2\n")
        assert fddb.read_fold(1) == ["2002/07/img_1", "2002/08/img_2"]
        path = fddb.write_fold_results(
            str(tmp_path / "out"),
            1,
            ["a"],
            [np.zeros((0, 4))],
            [np.zeros((0,))],
        )
        assert os.path.exists(path)
