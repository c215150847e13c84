"""Dataset / split / iterator invariants (mirrors the reference's
test/data/test_datasets.py and test_dataset_loader.py intent)."""

import numpy as np

from rapidobjectdetectionusingcascadedcnns_tpu.data import dataset as ds_mod
from rapidobjectdetectionusingcascadedcnns_tpu.data.preprocessor import Preprocessor


def _tiny_dataset(n=100, size=8, seed=0):
    rng = np.random.RandomState(seed)
    # pixel-value-as-index trick from the reference shuffle tests
    # (test_dataset_loader.py:38-79): image i is constant value i
    images = np.broadcast_to(
        np.arange(n, dtype=np.uint8)[:, None, None, None], (n, size, size, 3)
    ).copy()
    labels = rng.randint(0, 2, size=n).astype(np.int32)
    labels[: n // 4] = 1  # ensure both classes present
    pp = Preprocessor(images[: int(0.8 * n)].astype(np.float32), standardization=False)
    return ds_mod.Dataset(images, labels, [0.8, 0.1, 0.1], pp)


class TestBatch:
    def test_roundtrip_with_bottlenecks(self):
        imgs = np.zeros((4, 2, 2, 3), np.uint8)
        labels = np.array([0, 1, 0, 1])
        b = np.ones((4, 7), np.float32)
        batch = ds_mod.Batch(imgs, labels, b)
        assert batch.n_samples == 4
        assert batch.bottlenecks.shape == (4, 7)


class TestDeterministicShuffle:
    def test_depends_only_on_seed_and_n(self):
        # cascade stages at different resolutions must agree on the order
        p1 = ds_mod.deterministic_shuffle(1000)
        p2 = ds_mod.deterministic_shuffle(1000)
        np.testing.assert_array_equal(p1, p2)
        assert not np.array_equal(p1, ds_mod.deterministic_shuffle(1000, seed=7))

    def test_label_pairing_preserved(self):
        n = 50
        images, labels = np.arange(n), np.arange(n) * 2
        perm = ds_mod.deterministic_shuffle(n)
        np.testing.assert_array_equal(images[perm] * 2, labels[perm])


class TestDatasetSplits:
    def test_fractional_slicing(self):
        ds = _tiny_dataset(100)
        assert ds.train.n_samples == 80
        assert ds.valid.n_samples == 10
        assert ds.test.n_samples == 10

    def test_positive_proportion(self):
        ds = _tiny_dataset(100)
        s = ds.train
        assert abs(s.positive_proportion - s.labels.mean()) < 1e-12

    def test_positive_proportion_with_distribution(self):
        ds = _tiny_dataset(100)
        s = ds.train
        w = np.zeros(s.n_samples)
        w[s.labels == 1] = 1.0
        w /= w.sum()
        s.set_probability_distribution(w)
        assert abs(s.positive_proportion - 1.0) < 1e-12


class TestDeterministicIterator:
    def test_each_sample_once_per_epoch(self):
        ds = _tiny_dataset(100)
        it = ds_mod.DeterministicIterator(ds.train, batch_size=13, seed=3)
        seen = []
        for batch in it:
            seen.extend(batch.images[:, 0, 0, 0].tolist())
        assert sorted(seen) == sorted(ds.train.images[:, 0, 0, 0].tolist())
        assert it.epoch == 1

    def test_epoch_boundaries(self):
        ds = _tiny_dataset(100)
        it = ds_mod.DeterministicIterator(ds.train, batch_size=40)
        assert it.n_batches_per_epoch == 2
        it.next_batch
        assert it.in_first_epoch
        it.next_batch
        assert not it.in_first_epoch

    def test_label_pairing_in_batches(self):
        ds = _tiny_dataset(100)
        it = ds_mod.DeterministicIterator(ds.train, batch_size=17, seed=5)
        for _ in range(10):
            batch = it.next_batch
            np.testing.assert_array_equal(
                batch.labels, ds.train.labels[batch.images[:, 0, 0, 0]]
            )

    def test_no_shuffle_is_sequential(self):
        ds = _tiny_dataset(100)
        it = ds_mod.DeterministicIterator(ds.train, 30, shuffle_every_epoch=False)
        batch = it.next_batch
        np.testing.assert_array_equal(batch.images[:, 0, 0, 0], np.arange(30))


class TestRandomizedIterator:
    def test_respects_distribution(self):
        ds = _tiny_dataset(100)
        s = ds.train
        w = np.zeros(s.n_samples)
        w[:10] = 1.0
        w /= w.sum()
        it = ds_mod.RandomizedIterator(s, w, batch_size=5, seed=1)
        for _ in range(20):
            batch = it.next_batch
            assert (batch.images[:, 0, 0, 0] < 10).all()

    def test_without_replacement_within_batch(self):
        ds = _tiny_dataset(100)
        s = ds.train
        w = np.full(s.n_samples, 1.0 / s.n_samples)
        it = ds_mod.RandomizedIterator(s, w, batch_size=50, seed=2)
        batch = it.next_batch
        vals = batch.images[:, 0, 0, 0]
        assert len(np.unique(vals)) == len(vals)

    def test_default_iterator_selection(self):
        ds = _tiny_dataset(100)
        assert isinstance(
            ds.train.new_default_iterator(10), ds_mod.DeterministicIterator
        )
        w = np.full(ds.train.n_samples, 1.0 / ds.train.n_samples)
        ds.train.set_probability_distribution(w)
        assert isinstance(ds.train.new_default_iterator(10), ds_mod.RandomizedIterator)
