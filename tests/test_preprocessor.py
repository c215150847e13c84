"""Standardization statistics (mirrors the reference's
test/data/test_preprocessor.py: memory-efficient std vs np.std)."""

import numpy as np
import pytest

from rapidobjectdetectionusingcascadedcnns_tpu.data.preprocessor import (
    Preprocessor,
    welford_stats,
)


@pytest.mark.parametrize("dtype", [np.uint8, np.float32])
def test_welford_std_matches_numpy(dtype, rng):
    data = (rng.rand(50, 6, 6, 3) * 255).astype(dtype)
    _, var, n = welford_stats(iter(data))
    assert n == 50
    np.testing.assert_allclose(
        np.sqrt(var), np.std(data.astype(np.float64), axis=0, ddof=1), rtol=1e-6
    )


def test_preprocess_zero_mean_unit_std(rng):
    data = (rng.rand(200, 4, 4, 3) * 255).astype(np.float32)
    pp = Preprocessor(data)
    out = pp.preprocess_data(data)
    np.testing.assert_allclose(out.mean(axis=0), 0.0, atol=1e-4)
    # ddof=1 std ~ 1
    np.testing.assert_allclose(out.std(axis=0, ddof=1), 1.0, atol=1e-4)


def test_zero_std_guard():
    data = np.ones((10, 2, 2, 3), np.float32)
    pp = Preprocessor(data)
    assert (pp.std == 0.001).all()
    out = pp.preprocess_data(data)
    assert np.isfinite(out).all()


def test_inactive_preprocessor_passthrough(rng):
    data = (rng.rand(10, 2, 2, 3) * 255).astype(np.uint8)
    pp = Preprocessor(data, standardization=False)
    out = pp.preprocess_data(data)
    np.testing.assert_array_equal(out, data.astype(np.float32))


def test_does_not_mutate_input(rng):
    data = (rng.rand(20, 2, 2, 3) * 255).astype(np.float32)
    original = data.copy()
    pp = Preprocessor(data)
    pp.preprocess_data(data)
    np.testing.assert_array_equal(data, original)


def test_state_dict_roundtrip(rng):
    data = (rng.rand(20, 3, 3, 3) * 255).astype(np.float32)
    pp = Preprocessor(data)
    pp2 = Preprocessor.from_state_dict(pp.state_dict())
    x = (rng.rand(5, 3, 3, 3) * 255).astype(np.float32)
    np.testing.assert_allclose(pp.preprocess_data(x), pp2.preprocess_data(x))
