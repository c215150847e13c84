"""Host-parallel input pipeline."""

import numpy as np
import pytest

from rapidobjectdetectionusingcascadedcnns_tpu.data.prefetch import (
    PrefetchIterator,
    shard_for_host,
)


def test_prefetch_yields_everything_in_order():
    out = list(PrefetchIterator(iter(range(20)), depth=3))
    assert out == list(range(20))


def test_prefetch_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("boom")

    it = PrefetchIterator(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_prefetch_with_epoch_iterator():
    from rapidobjectdetectionusingcascadedcnns_tpu.data import dataset as ds_mod
    from rapidobjectdetectionusingcascadedcnns_tpu.data.preprocessor import Preprocessor

    images = np.arange(40, dtype=np.uint8)[:, None, None, None] * np.ones(
        (1, 4, 4, 3), np.uint8
    )
    labels = (np.arange(40) % 2).astype(np.int32)
    ds = ds_mod.Dataset(images, labels, [0.8, 0.1, 0.1], Preprocessor(None, False))
    it = ds_mod.DeterministicIterator(ds.train, batch_size=7, seed=0)
    seen = []
    for batch in PrefetchIterator(iter(it), depth=2):
        seen.extend(batch.images[:, 0, 0, 0].tolist())
    assert sorted(seen) == sorted(ds.train.images[:, 0, 0, 0].tolist())
    assert it.epoch == 1  # exactly one epoch consumed


def test_shard_for_host_partition():
    items = list(range(10))
    shards = [shard_for_host(items, i, 3) for i in range(3)]
    assert sorted(sum(shards, [])) == items
    assert shards[0] == [0, 3, 6, 9]
    # disjoint and exhaustive for any count
    for n_hosts in (2, 4, 7):
        shards = [shard_for_host(items, i, n_hosts) for i in range(n_hosts)]
        assert sorted(sum(shards, [])) == items
