"""groupRectangles parity.

The reference's NMS backend is ``cv2.groupRectangles``
(app/inference_app.py:198-212). The cv2 build in this image ships without the
objdetect module (no ``cv2.groupRectangles`` to call), so the oracle below is
a scalar union-find transliteration of the actual OpenCV *source* algorithm
(modules/objdetect/src/cascadedetect.cpp ``groupRectangles``): SimilarRects
partition -> class average -> ``n <= groupThreshold`` filter -> phase-2
containment rejection with the exact source condition
``(n2 > max(3, n1) || n1 < 3)``. If an environment with objdetect is
available, ``RODC_CV2_NMS_CHECK=1 pytest tests/test_nms.py`` additionally
asserts the oracle against the real ``cv2.groupRectangles``.

Known limitation: until validated against a cv2-with-objdetect build, parity
rests on this transliteration of the OpenCV source, not on OpenCV itself."""

import numpy as np
import pytest

from rapidobjectdetectionusingcascadedcnns_tpu.ops import nms


def _oracle_group(rects, min_neighbors, eps=0.2):
    """Scalar union-find groupRectangles oracle."""
    n = len(rects)
    if n == 0:
        return np.zeros((0, 4), np.int64), np.zeros((0,), np.int64)
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def similar(a, b):
        delta = eps * (min(a[2], b[2]) + min(a[3], b[3])) * 0.5
        return (
            abs(a[0] - b[0]) <= delta
            and abs(a[1] - b[1]) <= delta
            and abs(a[0] + a[2] - b[0] - b[2]) <= delta
            and abs(a[1] + a[3] - b[1] - b[3]) <= delta
        )

    for i in range(n):
        for j in range(i + 1, n):
            if similar(rects[i], rects[j]):
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[ri] = rj

    roots = {}
    for i in range(n):
        roots.setdefault(find(i), []).append(i)

    classes = []
    for members in roots.values():
        cnt = len(members)
        if cnt <= min_neighbors:
            continue
        s = np.sum([rects[m] for m in members], axis=0).astype(np.float64)
        avg = np.rint(s / cnt).astype(np.int64)
        classes.append((avg, cnt))

    kept = []
    for i, (r1, n1) in enumerate(classes):
        ok = True
        for j, (r2, n2) in enumerate(classes):
            if i == j:
                continue
            # container dims with cvRound (OpenCV phase 2)
            dx = int(np.rint(r2[2] * 0.2))
            dy = int(np.rint(r2[3] * 0.2))
            if (
                r1[0] >= r2[0] - dx
                and r1[1] >= r2[1] - dy
                and r1[0] + r1[2] <= r2[0] + r2[2] + dx
                and r1[1] + r1[3] <= r2[1] + r2[3] + dy
                # OpenCV source condition: (n2 > max(3, n1) || n1 < 3)
                and (n2 > max(3, n1) or n1 < 3)
            ):
                ok = False
                break
        if ok:
            kept.append((r1, n1))
    if not kept:
        return np.zeros((0, 4), np.int64), np.zeros((0,), np.int64)
    return (
        np.stack([k[0] for k in kept]),
        np.array([k[1] for k in kept], np.int64),
    )


def _reference_group(rects, min_neighbors, eps=0.2):
    """The oracle; when real cv2.groupRectangles exists (objdetect present),
    cross-check the oracle against it before returning."""
    import os

    ours = _oracle_group(rects, min_neighbors, eps)
    if os.environ.get("RODC_CV2_NMS_CHECK"):
        import cv2

        cv_r, cv_w = cv2.groupRectangles(
            [tuple(int(v) for v in r) for r in rects] , min_neighbors, eps
        )
        cv_r = np.asarray(cv_r, np.int64).reshape(-1, 4)
        cv_w = np.asarray(cv_w, np.int64).reshape(-1)
        assert _as_sets(ours[0], ours[1]) == _as_sets(cv_r, cv_w)
    return ours


def _as_sets(rects, weights):
    return sorted(map(tuple, np.concatenate([rects, weights[:, None]], axis=1).tolist()))


def _random_clusters(rng, n_clusters, per_cluster, jitter, size=60):
    rects = []
    for _ in range(n_clusters):
        cx, cy = rng.randint(50, 400, size=2)
        for _ in range(per_cluster):
            dx, dy, dw, dh = rng.randint(-jitter, jitter + 1, size=4)
            rects.append((cx + dx, cy + dy, size + dw, size + dh))
    return np.array(rects, dtype=np.int64)


@pytest.mark.parametrize("min_neighbors", [0, 1, 2, 3])
def test_matches_opencv_source_on_random_clusters(min_neighbors, rng):
    for trial in range(8):
        rects = _random_clusters(
            rng, n_clusters=rng.randint(1, 5), per_cluster=rng.randint(1, 6), jitter=4
        )
        ours_r, ours_w = nms.group_rectangles(rects, min_neighbors)
        cv_r, cv_w = _reference_group(rects, min_neighbors)
        assert _as_sets(ours_r, ours_w) == _as_sets(cv_r, cv_w), (
            trial,
            min_neighbors,
            rects.tolist(),
        )


def test_matches_opencv_source_on_scattered_singletons(rng):
    rects = np.stack(
        [
            rng.randint(0, 500, size=20),
            rng.randint(0, 500, size=20),
            rng.randint(20, 80, size=20),
            rng.randint(20, 80, size=20),
        ],
        axis=1,
    )
    for mn in (0, 1, 2):
        ours_r, ours_w = nms.group_rectangles(rects, mn)
        cv_r, cv_w = _reference_group(rects, mn)
        assert _as_sets(ours_r, ours_w) == _as_sets(cv_r, cv_w)


def _cluster_at(x, y, w, h, count, jitter=2):
    """`count` nearly-identical rects forming one similarity class."""
    out = []
    for k in range(count):
        d = (k % (2 * jitter + 1)) - jitter
        out.append((x + d, y - d, w + d, h - d))
    return out


@pytest.mark.parametrize("min_neighbors", [0, 1])
def test_weak_cluster_inside_equal_strength_container_rejected(min_neighbors):
    """OpenCV's phase-2 `n1 < 3` clause: a count-2 class contained in a
    count-3 class is dropped even though n2=3 is NOT > max(3, n1)=3. This is
    the exact divergence the round-1 implementations missed."""
    container = _cluster_at(100, 100, 200, 200, count=3)
    contained = _cluster_at(160, 160, 60, 60, count=2)
    rects = np.array(container + contained, dtype=np.int64)

    ours_r, ours_w = nms.group_rectangles(rects, min_neighbors)
    ref_r, ref_w = _reference_group(rects, min_neighbors)
    assert _as_sets(ours_r, ours_w) == _as_sets(ref_r, ref_w)
    # only the container survives
    assert len(ours_r) == 1 and ours_w[0] == 3

    # jax variant agrees
    import jax.numpy as jnp

    avg, counts, keep = nms.group_rectangles_jax(
        jnp.asarray(rects, jnp.float32), jnp.ones(len(rects), bool), min_neighbors
    )
    jax_out = [
        tuple(np.asarray(avg[i]).tolist()) + (int(counts[i]),)
        for i in range(len(rects))
        if bool(keep[i])
    ]
    ref = [tuple(r.tolist()) + (int(w),) for r, w in zip(ours_r, ours_w)]
    assert sorted(jax_out) == sorted(ref)


def test_strong_cluster_inside_equal_strength_container_kept():
    """n1=3 inside n2=3: neither clause fires (n2 not > max(3,3), n1 not < 3)
    so the contained class is kept."""
    container = _cluster_at(100, 100, 200, 200, count=3)
    contained = _cluster_at(160, 160, 60, 60, count=3)
    rects = np.array(container + contained, dtype=np.int64)
    ours_r, ours_w = nms.group_rectangles(rects, 1)
    ref_r, ref_w = _reference_group(rects, 1)
    assert _as_sets(ours_r, ours_w) == _as_sets(ref_r, ref_w)
    assert len(ours_r) == 2


def test_weak_cluster_inside_strong_container_rejected():
    """n1=2 inside n2=5: rejected (both clauses fire)."""
    container = _cluster_at(100, 100, 200, 200, count=5)
    contained = _cluster_at(160, 160, 60, 60, count=2)
    rects = np.array(container + contained, dtype=np.int64)
    ours_r, ours_w = nms.group_rectangles(rects, 1)
    ref_r, ref_w = _reference_group(rects, 1)
    assert _as_sets(ours_r, ours_w) == _as_sets(ref_r, ref_w)
    assert len(ours_r) == 1 and ours_w[0] == 5


def test_native_kernel_weak_contained_cluster(tmp_path):
    """The C++ kernel (when built) must carry the same phase-2 condition."""
    from rapidobjectdetectionusingcascadedcnns_tpu import native

    rects = np.array(
        _cluster_at(100, 100, 200, 200, count=3) + _cluster_at(160, 160, 60, 60, count=2),
        dtype=np.int64,
    )
    result = native.group_rectangles(rects, 1, 0.2)
    if result is None:
        pytest.skip("native kernel not built in this environment")
    kept, weights = result
    ref_r, ref_w = _reference_group(rects, 1)
    assert _as_sets(kept, weights) == _as_sets(ref_r, ref_w)


def test_empty_input():
    r, w = nms.group_rectangles(np.zeros((0, 4)), 1)
    assert len(r) == 0 and len(w) == 0


def test_nms_boxes_xyxy_roundtrip():
    boxes = np.array([[10, 10, 70, 70], [12, 11, 71, 72], [300, 300, 360, 360]])
    kept, weights = nms.nms_boxes(boxes, min_neighbors=1)
    # the isolated box has only 1 member -> rejected at min_neighbors=1
    assert len(kept) == 1
    assert weights[0] == 2
    assert kept[0][2] > kept[0][0] and kept[0][3] > kept[0][1]


def test_jax_variant_matches_numpy(rng):
    import jax.numpy as jnp

    for mn in (0, 1, 2):
        rects = _random_clusters(rng, 3, 4, 4)
        n = len(rects)
        pad = 8  # exercise padding rows
        rects_p = np.concatenate([rects, np.zeros((pad, 4))], axis=0)
        valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
        avg, counts, keep = nms.group_rectangles_jax(
            jnp.asarray(rects_p, jnp.float32), jnp.asarray(valid), mn
        )
        ours = [
            tuple(np.asarray(avg[i]).tolist()) + (int(counts[i]),)
            for i in range(n + pad)
            if bool(keep[i])
        ]
        ref_r, ref_w = nms.group_rectangles(rects, mn)
        ref = [tuple(r.tolist()) + (int(w),) for r, w in zip(ref_r, ref_w)]
        assert sorted(ours) == sorted(ref)


def test_eps_controls_chaining():
    """nms_opencv_eps is a real knob (round 5): a bridge rect chains two
    clusters into one off-target average at the cv2-default eps=0.2; a
    smaller eps breaks the chain and keeps the two faces separate (the
    benchmark scene-52 failure mode, NOTES.md round 5)."""
    # two 3-member clusters 36 px apart (similarity delta at eps=0.2 is
    # 0.2*0.5*(60+60)=12 px, so they never link directly) plus two bridge
    # rects at 12 px steps: the bridges chain everything into ONE cluster
    # at eps=0.2; at eps=0.1 (delta 6) the chain breaks, the singleton
    # bridges fall to phase-2 containment (n<3 inside a stronger box,
    # fixed 0.2 margin), and the two real clusters survive separately
    a = np.array([[100, 100, 60, 60], [102, 101, 60, 60], [101, 99, 60, 60]])
    b = np.array([[136, 100, 60, 60], [138, 101, 60, 60], [137, 99, 60, 60]])
    bridge = np.array([[113, 100, 60, 60], [125, 100, 60, 60]])
    rects = np.concatenate([a, b, bridge])
    kept_wide, w_wide = nms.group_rectangles(rects, 0, eps=0.2)
    kept_narrow, w_narrow = nms.group_rectangles(rects, 0, eps=0.1)
    # eps=0.2: |dx|=45 <= 0.2*0.5*(60+60)=... chains everything into ONE
    assert len(kept_wide) == 1 and w_wide[0] == 8
    assert len(kept_narrow) == 2 and sorted(w_narrow.tolist()) == [3, 3]
    # the jax variant honors the same eps
    import jax.numpy as jnp

    avg, counts, keep = nms.group_rectangles_jax(
        jnp.asarray(rects, jnp.float32), jnp.asarray(np.ones(len(rects), bool)),
        0, eps=0.1,
    )
    ours = [
        tuple(np.asarray(avg[i]).tolist()) + (int(counts[i]),)
        for i in range(len(rects))
        if bool(keep[i])
    ]
    ref = [tuple(r.tolist()) + (int(w),) for r, w in zip(kept_narrow, w_narrow)]
    assert sorted(ours) == sorted(ref)


def test_postprocess_raw_honors_eps_config():
    from rapidobjectdetectionusingcascadedcnns_tpu.serve import postprocess_raw

    boxes = np.array(
        [[100, 100, 160, 160], [102, 101, 162, 161], [101, 99, 161, 159],
         [136, 100, 196, 160], [138, 101, 198, 161], [137, 99, 197, 159],
         [113, 100, 173, 160], [125, 100, 185, 160]], float,
    )
    conf = np.ones(len(boxes))
    wide, _ = postprocess_raw(
        boxes, conf, nms_mode="NMS_OPENCV", nms_min_neighbors=0,
        vertically_enlarge=False, nms_eps=0.2,
    )
    narrow, _ = postprocess_raw(
        boxes, conf, nms_mode="NMS_OPENCV", nms_min_neighbors=0,
        vertically_enlarge=False, nms_eps=0.1,
    )
    assert len(narrow) > len(wide)
