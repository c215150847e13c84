"""Non-maximum suppression: OpenCV ``groupRectangles``-compatible clustering.

The reference delegates NMS to ``cv2.groupRectangles(min_neighbors)``
(app/inference_app.py:168-217): that algorithm is *equivalence-class
clustering*, not score-sorted greedy NMS. Semantics reproduced here:

  1. Two rectangles are "similar" iff all four coordinate deltas are within
     ``eps * 0.5 * (min(w1, w2) + min(h1, h2))`` (OpenCV ``SimilarRects`` with
     default ``eps = 0.2``).
  2. Rectangles are partitioned into connected components of the similarity
     relation (OpenCV ``partition``).
  3. Each class is averaged (``x * 1/n`` with round-half-to-even int cast)
     and rejected if its member count ``n <= min_neighbors``.
  4. A surviving class is also rejected if it lies inside another surviving
     class and either the container has a sufficiently larger count
     (``n2 > max(3, n1)``) or the contained class itself is weak
     (``n1 < 3``), under a small tolerance of 0.2 of the container's size.
  5. Returned weight per kept class = member count (the reference uses this
     as the output confidence, app/inference_app.py:206-212).

Two implementations:
  * :func:`group_rectangles`  — vectorized numpy (host post-processing path;
    candidate counts after the cascade are tiny, so the host cost is noise);
  * :func:`group_rectangles_jax` — fixed-shape jax version (label propagation
    for connected components) usable inside jitted device pipelines, for
    pure-device serving where even small host round-trips matter.

Oracle-tested against ``cv2.groupRectangles`` in tests/test_nms.py.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _similarity_matrix(xywh: np.ndarray, eps: float) -> np.ndarray:
    """(N, N) bool similarity per OpenCV SimilarRects."""
    x, y, w, h = xywh[:, 0], xywh[:, 1], xywh[:, 2], xywh[:, 3]
    delta = eps * 0.5 * (np.minimum(w[:, None], w[None, :]) + np.minimum(h[:, None], h[None, :]))
    ok = (
        (np.abs(x[:, None] - x[None, :]) <= delta)
        & (np.abs(y[:, None] - y[None, :]) <= delta)
        & (np.abs((x + w)[:, None] - (x + w)[None, :]) <= delta)
        & (np.abs((y + h)[:, None] - (y + h)[None, :]) <= delta)
    )
    return ok


def _connected_components(adj: np.ndarray) -> np.ndarray:
    """Component labels via iterated min-label propagation (host numpy)."""
    n = adj.shape[0]
    labels = np.arange(n)
    while True:
        # each node takes the minimum label among its neighbors (incl. itself)
        prop = np.where(adj, labels[None, :], n)
        new_labels = np.minimum(labels, prop.min(axis=1))
        if np.array_equal(new_labels, labels):
            return labels
        labels = new_labels


def _round_half_even(x: np.ndarray) -> np.ndarray:
    """cv2 saturate_cast<int> rounding (round half to even, like np.rint)."""
    return np.rint(x).astype(np.int64)


def group_rectangles(
    rects_xywh: np.ndarray,
    min_neighbors: int,
    eps: float = 0.2,
) -> Tuple[np.ndarray, np.ndarray]:
    """groupRectangles-compatible clustering.

    ``rects_xywh``: (N, 4) int/float array of (x, y, w, h).
    Returns ``(kept_xywh (M, 4) int64, weights (M,) int64)``.
    """
    rects_xywh = np.asarray(rects_xywh, dtype=np.float64)
    n = len(rects_xywh)
    if n == 0:
        return np.zeros((0, 4), np.int64), np.zeros((0,), np.int64)

    labels = _connected_components(_similarity_matrix(rects_xywh, eps))
    uniq, inverse, counts = np.unique(labels, return_inverse=True, return_counts=True)
    n_classes = len(uniq)

    # class average with OpenCV's scale-then-round arithmetic
    sums = np.zeros((n_classes, 4), dtype=np.float64)
    np.add.at(sums, inverse, rects_xywh)
    avg = _round_half_even(sums / counts[:, None])

    keep_counts = counts > min_neighbors
    cls_rects = avg[keep_counts]
    cls_weights = counts[keep_counts]

    m = len(cls_rects)
    if m <= 1:
        return cls_rects, cls_weights

    # phase 2: drop a class if it sits inside a (sufficiently more supported)
    # other class, with tolerance 0.2 of its own dims (OpenCV groupRectangles)
    x1, y1, w1, h1 = cls_rects[:, 0], cls_rects[:, 1], cls_rects[:, 2], cls_rects[:, 3]
    # tolerance uses the CONTAINER's dims with cvRound (OpenCV phase 2)
    dx = _round_half_even(w1 * 0.2)
    dy = _round_half_even(h1 * 0.2)
    # i inside j?
    inside = (
        (x1[:, None] >= x1[None, :] - dx[None, :])
        & (y1[:, None] >= y1[None, :] - dy[None, :])
        & ((x1 + w1)[:, None] <= (x1 + w1)[None, :] + dx[None, :])
        & ((y1 + h1)[:, None] <= (y1 + h1)[None, :] + dy[None, :])
    )
    np.fill_diagonal(inside, False)
    # OpenCV phase 2: reject i inside j when (n2 > max(3, n1) || n1 < 3)
    stronger = (cls_weights[None, :] > np.maximum(3, cls_weights[:, None])) | (
        cls_weights[:, None] < 3
    )
    rejected = (inside & stronger).any(axis=1)

    return cls_rects[~rejected], cls_weights[~rejected]


def group_rectangles_jax(rects_xywh, valid_mask, min_neighbors: int, eps: float = 0.2):
    """Fixed-shape on-device variant for jitted pipelines.

    ``rects_xywh``: (N, 4) float32; ``valid_mask``: (N,) bool marking real
    candidates (padding rows must be False). Returns
    ``(avg_xywh (N, 4) int32, weights (N,) int32, keep (N,) bool)`` where at
    most the first components are meaningful per unique component; ``keep``
    marks one representative row per surviving cluster.

    Connected components run as a fixed ``ceil(log2(N))+1``-step min-label
    propagation, which XLA compiles to a short chain of (N, N) reductions —
    ideal for the post-cascade candidate counts (hundreds).
    """
    import jax.numpy as jnp

    rects = rects_xywh.astype(jnp.float32)
    n = rects.shape[0]
    x, y, w, h = rects[:, 0], rects[:, 1], rects[:, 2], rects[:, 3]
    delta = eps * 0.5 * (
        jnp.minimum(w[:, None], w[None, :]) + jnp.minimum(h[:, None], h[None, :])
    )
    adj = (
        (jnp.abs(x[:, None] - x[None, :]) <= delta)
        & (jnp.abs(y[:, None] - y[None, :]) <= delta)
        & (jnp.abs((x + w)[:, None] - (x + w)[None, :]) <= delta)
        & (jnp.abs((y + h)[:, None] - (y + h)[None, :]) <= delta)
        & valid_mask[:, None]
        & valid_mask[None, :]
    )

    labels = jnp.where(valid_mask, jnp.arange(n), n)
    # neighbor-min alone needs O(diameter) steps; adding pointer jumping
    # (label <- label[label]) doubles the reach per iteration, so
    # ceil(log2 N)+1 iterations always converge
    n_steps = max(1, int(np.ceil(np.log2(max(n, 2)))) + 1)
    labels_ext = None
    for _ in range(n_steps):
        prop = jnp.where(adj, labels[None, :], n)
        labels = jnp.minimum(labels, prop.min(axis=1))
        labels_ext = jnp.concatenate([labels, jnp.array([n])])  # slot for "n"
        labels = jnp.minimum(labels, labels_ext[labels])

    # per-component sums/counts via one-hot matmul (MXU-friendly); HIGHEST
    # precision — coordinate sums must stay integer-exact in float32 (default
    # matmul precision may round operands to bfloat16)
    import jax

    same = (labels[:, None] == labels[None, :]) & valid_mask[:, None] & valid_mask[None, :]
    same_f = same.astype(jnp.float32)
    counts = jnp.sum(same_f, axis=1)
    sums = jnp.matmul(
        same_f, rects, precision=jax.lax.Precision.HIGHEST
    )  # (N, 4)
    avg = jnp.where(
        counts[:, None] > 0, jnp.rint(sums / jnp.maximum(counts[:, None], 1.0)), 0.0
    ).astype(jnp.int32)

    is_representative = (labels == jnp.arange(n)) & valid_mask
    keep = is_representative & (counts > min_neighbors)

    # phase-2 containment rejection among surviving representatives
    xa, ya, wa, ha = (
        avg[:, 0].astype(jnp.float32),
        avg[:, 1].astype(jnp.float32),
        avg[:, 2].astype(jnp.float32),
        avg[:, 3].astype(jnp.float32),
    )
    dx = jnp.rint(wa * 0.2)  # container dims, cvRound (OpenCV phase 2)
    dy = jnp.rint(ha * 0.2)
    inside = (
        (xa[:, None] >= xa[None, :] - dx[None, :])
        & (ya[:, None] >= ya[None, :] - dy[None, :])
        & ((xa + wa)[:, None] <= (xa + wa)[None, :] + dx[None, :])
        & ((ya + ha)[:, None] <= (ya + ha)[None, :] + dy[None, :])
        & keep[:, None]
        & keep[None, :]
        & ~jnp.eye(n, dtype=bool)
    )
    # OpenCV phase 2: reject i inside j when (n2 > max(3, n1) || n1 < 3)
    stronger = (counts[None, :] > jnp.maximum(3.0, counts[:, None])) | (
        counts[:, None] < 3.0
    )
    rejected = jnp.any(inside & stronger, axis=1)
    keep = keep & ~rejected

    return avg, counts.astype(jnp.int32), keep


def group_rectangles_fast(
    rects_xywh: np.ndarray, min_neighbors: int, eps: float = 0.2
) -> Tuple[np.ndarray, np.ndarray]:
    """groupRectangles via the native C++ kernel when available (the union-
    find clustering is O(N^2) host work on the frame-latency path), falling
    back to the vectorized numpy implementation."""
    from .. import native

    result = native.group_rectangles(rects_xywh, min_neighbors, eps)
    if result is not None:
        return result
    return group_rectangles(rects_xywh, min_neighbors, eps)


def nms_boxes(
    boxes_xyxy: np.ndarray,
    min_neighbors: int,
    eps: float = 0.2,
) -> Tuple[np.ndarray, np.ndarray]:
    """Convenience wrapper in (xmin, ymin, xmax, ymax) convention.

    Returns kept boxes in xyxy plus weights (= neighbor counts, used as the
    output confidence like app/inference_app.py:206-212).
    """
    boxes_xyxy = np.asarray(boxes_xyxy)
    if len(boxes_xyxy) == 0:
        return np.zeros((0, 4), np.int64), np.zeros((0,), np.int64)
    xywh = np.stack(
        [
            boxes_xyxy[:, 0],
            boxes_xyxy[:, 1],
            boxes_xyxy[:, 2] - boxes_xyxy[:, 0],
            boxes_xyxy[:, 3] - boxes_xyxy[:, 1],
        ],
        axis=1,
    )
    kept, weights = group_rectangles_fast(xywh, min_neighbors, eps)
    if len(kept) == 0:
        return np.zeros((0, 4), np.int64), weights
    out = np.stack(
        [kept[:, 0], kept[:, 1], kept[:, 0] + kept[:, 2], kept[:, 1] + kept[:, 3]],
        axis=1,
    )
    return out, weights
