"""Pallas NMS clustering kernel vs the numpy union-find implementation.

Runs in Pallas interpreter mode on the CPU test backend; the compiled path is
exercised on TPU hardware by the serving pipeline.
"""

import numpy as np
import pytest

from rapidobjectdetectionusingcascadedcnns_tpu.ops import nms
from rapidobjectdetectionusingcascadedcnns_tpu.ops.nms_pallas import (
    group_rectangles_pallas,
)


def _random_clusters(rng, n_clusters, per_cluster, jitter, size=60):
    rects = []
    for _ in range(n_clusters):
        cx, cy = rng.randint(50, 400, size=2)
        for _ in range(per_cluster):
            dx, dy, dw, dh = rng.randint(-jitter, jitter + 1, size=4)
            rects.append((cx + dx, cy + dy, size + dw, size + dh))
    return np.array(rects, dtype=np.float64)


def _pallas_clusters(rects, min_neighbors):
    n = len(rects)
    valid = np.ones((n,), bool)
    avg, counts, keep = group_rectangles_pallas(
        rects.astype(np.float32), valid, min_neighbors, interpret=True
    )
    avg = np.asarray(avg)
    counts = np.asarray(counts)
    keep = np.asarray(keep)
    return sorted(
        tuple(avg[i].tolist()) + (int(counts[i]),) for i in range(n) if keep[i]
    )


def _numpy_clusters(rects, min_neighbors):
    """Clustering + averaging + min_neighbors only (no containment pass),
    matching the kernel's contract."""
    labels = nms._connected_components(nms._similarity_matrix(rects, 0.2))
    out = []
    for lbl in np.unique(labels):
        members = rects[labels == lbl]
        if len(members) <= min_neighbors:
            continue
        avg = nms._round_half_even(members.sum(axis=0) / len(members))
        out.append(tuple(avg.tolist()) + (len(members),))
    return sorted(out)


@pytest.mark.parametrize("min_neighbors", [0, 1, 2])
def test_pallas_matches_numpy(min_neighbors, rng):
    for _ in range(5):
        rects = _random_clusters(rng, rng.randint(1, 5), rng.randint(1, 6), 4)
        assert _pallas_clusters(rects, min_neighbors) == _numpy_clusters(
            rects, min_neighbors
        )


def test_pallas_padding_rows_are_inert(rng):
    rects = _random_clusters(rng, 2, 3, 3)
    # n=6 pads to 128 inside the kernel; results must ignore padding
    out = _pallas_clusters(rects, 0)
    assert sum(c for *_, c in out) == len(rects)


def test_pallas_single_candidate():
    rects = np.array([[10, 10, 50, 50]], np.float64)
    assert _pallas_clusters(rects, 0) == [(10, 10, 50, 50, 1)]
    assert _pallas_clusters(rects, 1) == []
