"""Pallas TPU kernel: groupRectangles clustering fully in VMEM.

The XLA implementation (ops/nms.py:group_rectangles_jax) runs min-label
propagation as ~log2(N)+1 separate (N, N) reductions, each materializing the
similarity/equality matrices through HBM. For the post-cascade candidate
counts (N <= ~1024) the whole working set — boxes (N, 4), the (N, N)
adjacency and the label vector — fits in VMEM, so this kernel:

  * computes the SimilarRects adjacency once into VMEM scratch,
  * iterates min-label propagation with a ``fori_loop`` that never leaves
    VMEM (one matmul-shaped reduction per step on the VPU),
  * emits per-cluster averaged boxes, member counts and representative flags
    in a single ``pallas_call``.

The containment-rejection pass stays in the caller (ops/nms.py semantics).
Used for pure-device serving tails; the numpy/native paths remain the host
post-processing default. Tests run the kernel in interpreter mode on CPU and
against the union-find oracle.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cluster_kernel(rects_ref, valid_ref, avg_ref, counts_ref, labels_ref, adj_scratch):
    """One program instance handles the full (padded) candidate set.

    rects_ref: (N, 4) f32 xywh; valid_ref: (N, 1) f32 1/0 mask.
    Outputs: avg_ref (N, 4) f32 cluster means, counts_ref (N, 1) f32 member
    counts, labels_ref (N, 1) f32 component labels (min member index).
    """
    n = rects_ref.shape[0]
    rects = rects_ref[:]
    valid = valid_ref[:][:, 0]

    x = rects[:, 0]
    y = rects[:, 1]
    w = rects[:, 2]
    h = rects[:, 3]

    eps = 0.2
    delta = eps * 0.5 * (
        jnp.minimum(w[:, None], w[None, :]) + jnp.minimum(h[:, None], h[None, :])
    )
    adj = (
        (jnp.abs(x[:, None] - x[None, :]) <= delta)
        & (jnp.abs(y[:, None] - y[None, :]) <= delta)
        & (jnp.abs((x + w)[:, None] - (x + w)[None, :]) <= delta)
        & (jnp.abs((y + h)[:, None] - (y + h)[None, :]) <= delta)
        & (valid[:, None] > 0)
        & (valid[None, :] > 0)
    )
    adj_scratch[:] = adj.astype(jnp.float32)  # stays resident in VMEM

    # iota must be integer-typed on Mosaic; cast afterwards
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0].astype(jnp.float32)
    init_labels = jnp.where(valid > 0, row_ids, float(n))

    n_steps = max(1, int(math.ceil(math.log2(max(n, 2)))) + 1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(jnp.float32)

    def propagate(_, labels):
        # neighbor-min: min over j of (adj[i, j] ? labels[j] : n)
        candidate = jnp.where(adj_scratch[:] > 0, labels[None, :], float(n))
        labels = jnp.minimum(labels, jnp.min(candidate, axis=1))
        # pointer jumping (label <- label[label]) via one-hot select so the
        # reach doubles per iteration (no per-lane gathers on TPU vectors)
        is_target = labels[:, None] == col_ids
        jumped = jnp.min(
            jnp.where(is_target, labels[None, :], float(n)), axis=1
        )
        return jnp.minimum(labels, jumped)

    labels = jax.lax.fori_loop(0, n_steps, propagate, init_labels)

    # per-component sums/counts via the same-label indicator (VMEM-local)
    same = (labels[:, None] == labels[None, :]) & (valid[:, None] > 0) & (
        valid[None, :] > 0
    )
    same_f = same.astype(jnp.float32)
    counts = jnp.sum(same_f, axis=1)
    sums = jax.lax.dot_general(
        same_f,
        rects,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    avg = jnp.where(
        counts[:, None] > 0,
        jnp.round(sums / jnp.maximum(counts[:, None], 1.0)),
        0.0,
    )

    avg_ref[:] = avg
    counts_ref[:] = counts[:, None]
    labels_ref[:] = labels[:, None]


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def _cluster_call(rects_padded, valid_padded, interpret=False):
    n = rects_padded.shape[0]
    return pl.pallas_call(
        _cluster_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, 4), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((n, n), jnp.float32)],
        interpret=interpret,
    )(rects_padded, valid_padded)


def group_rectangles_pallas(
    rects_xywh,
    valid_mask,
    min_neighbors: int,
    *,
    interpret: bool = False,
):
    """Pallas clustering with the same contract as
    :func:`..ops.nms.group_rectangles_jax` (minus the containment pass, which
    the caller applies): returns (avg (N, 4) int32, counts (N,) int32,
    keep (N,) bool).

    Pads N to a lane multiple; VMEM budget is the (N, N) adjacency, so keep
    N <= ~1536 (the cascade's post-threshold candidate counts are far below).
    """
    rects = jnp.asarray(rects_xywh, jnp.float32)
    valid = jnp.asarray(valid_mask)
    n = rects.shape[0]
    n_pad = max(_round_up(n, 128), 128)
    rects_p = jnp.zeros((n_pad, 4), jnp.float32).at[:n].set(rects)
    valid_p = (
        jnp.zeros((n_pad, 1), jnp.float32)
        .at[:n, 0]
        .set(valid.astype(jnp.float32))
    )

    avg, counts, labels = _cluster_call(rects_p, valid_p, interpret=interpret)
    avg = avg[:n].astype(jnp.int32)
    counts = counts[:n, 0].astype(jnp.int32)
    labels = labels[:n, 0].astype(jnp.int32)

    row_ids = jnp.arange(n, dtype=jnp.int32)
    keep = (labels == row_ids) & valid.astype(bool) & (counts > min_neighbors)
    return avg, counts, keep
