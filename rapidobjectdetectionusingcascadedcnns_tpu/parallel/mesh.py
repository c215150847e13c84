"""Device mesh + sharding layer.

The reference is strictly single-device (utils/cpu_gpu_switcher.py limits TF
to one GPU; SURVEY.md §2.6). This module is its TPU-native *superset*: a
first-class data-parallel layer over ``jax.sharding.Mesh``.

Sharding design (SURVEY.md §2.6 "TPU-native equivalents"):
  * axis ``"data"`` — the batch axis for training AND the *window* axis for
    inference. The cascade has no sequence dimension; its scaling axis is the
    pyramid's window count, so sharding windows across chips is the analog of
    sequence parallelism for this workload (SURVEY.md §5 "long-context").
  * parameters are replicated (models are <= a few MB — far below the point
    where TP/PP would pay for their collectives; documented as N/A).
  * gradient/metric reduction: jit + NamedSharding lets XLA insert the
    all-reduce over ICI; no hand-written collectives needed on this path.

Multi-host extension: each process feeds its local shard via
``jax.make_array_from_process_local_data``; the helpers below are written
against the global mesh so they work unchanged under multi-host jax.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the visible devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def mesh_from_config() -> Optional[Mesh]:
    """Resolve the training mesh from ``train_mesh_devices``.

    ``None``/``1``/``0`` => single-device (no mesh); ``"all"``/``-1`` => all
    visible devices; ``n`` => the first n devices. Returns None when only one
    device would participate (the trainers then skip all sharding plumbing).
    This is the config hook run_train_*.py uses to turn on batch-sharded
    data-parallel training — the capability the reference's single-GPU design
    rules out (utils/cpu_gpu_switcher.py:14-17, SURVEY.md §2.6 item 1).
    """
    from .. import config as cf

    want = cf.get("train_mesh_devices")
    if want in (None, 0, 1, False):
        return None
    available = len(jax.devices())
    n = available if want in ("all", -1, True) else min(int(want), available)
    if n <= 1:
        return None
    return get_mesh(n)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch/window) axis across the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(array: np.ndarray, multiple: int, axis: int = 0):
    """Pad ``array`` along ``axis`` so its length divides ``multiple``.

    Returns (padded, original_length). Batches sharded over a mesh must have
    device-divisible leading dims; padding + masking keeps shapes static.
    """
    length = array.shape[axis]
    target = ((length + multiple - 1) // multiple) * multiple
    if target == length:
        return array, length
    pad_widths = [(0, 0)] * array.ndim
    pad_widths[axis] = (0, target - length)
    return np.pad(array, pad_widths, mode="edge"), length


def shard_batch(mesh: Mesh, *arrays):
    """Device-put arrays with the leading axis sharded over the mesh."""
    sharding = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Device-put a pytree fully replicated over the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), tree)


def local_device_count(mesh: Optional[Mesh] = None) -> int:
    if mesh is None:
        return jax.local_device_count()
    return mesh.devices.size
