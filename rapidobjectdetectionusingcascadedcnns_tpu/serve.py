"""AOT serving bundles: the compiled cascade program as a deployable artifact.

The reference ships ``InferenceOptimizer`` (network/inference_optimizer.py:
1-96): it freezes the trained TF graph — weights baked as constants, training
subgraphs pruned — so serving loads a single optimized artifact instead of
rebuilding the training graph. The TPU-native analog is :mod:`jax.export`:
the jitted cascade program (weights and pyramid geometry baked as constants,
including the device-side NMS tail) is serialized to a version-stable
StableHLO artifact. A serving host loads the bundle and detects WITHOUT the
model object, the config, or any Python tracing — deserialization +
compilation of the shipped program is all that happens at startup.

A bundle holds a *capacity ladder*: the same program exported at the base
survivor capacities and at each escalation rung the live detector would
re-dispatch to on saturation (models/cascade.escalate_capacities). The
serving loop walks the ladder exactly like ``CascadeDetector`` walks its
doubling loop, so reference-unbounded survivor semantics
(app/inference_cascade_app.py:217-240) hold as long as the ladder is deep
enough; a top-rung saturation falls back to warn-and-truncate, and the
bundle records how many rungs it carries.

The weights ride in the bundle ONCE (``weights.npz``, pre-cast to the
compute dtype exactly like the live chunked path's loop-invariant precast,
models/cascade._precast_params) and enter every rung program as arguments —
baking them as per-program constants would triple the flagship's ~200 MB of
fc1 masters across a 3-rung ladder.

Layout on disk (``save_bundle``)::

    <dir>/meta.json        everything unpack/serve needs, config-free
    <dir>/weights.npz      flat weight arrays, shared by all rungs
    <dir>/program_0.bin    jax.export blob at base capacities
    <dir>/program_1.bin    ... first escalation rung, etc.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from . import config as cf
from .models import cascade as casc
from .models.cascade import CascadeModel, DetectionResult
from .ops import nms as nms_ops
from .ops import rectangles as rect_ops
from .ops.pyramid import build_plan, window_table
from .utils import log

FORMAT_VERSION = 1


def postprocess_raw(
    boxes: np.ndarray,
    conf: np.ndarray,
    *,
    nms_mode: str,
    nms_min_neighbors: int,
    vertically_enlarge: bool,
    nms_eps: float = 0.2,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side NMS + optional vertical enlargement
    (app/inference_app.py:219-231) — the single config-free implementation
    shared by the live detector (models/cascade._postprocess), the
    window-sharded path, and the serving decoder below."""
    if len(boxes) == 0:
        return np.zeros((0, 4), np.float64), np.zeros((0,), np.float64)
    if nms_mode == cf.NMS_OPENCV:
        out_boxes, weights = nms_ops.nms_boxes(boxes, nms_min_neighbors, nms_eps)
        out_boxes = out_boxes.astype(np.float64)
        out_conf = weights.astype(np.float64)
    else:
        out_boxes = boxes.astype(np.float64)
        out_conf = conf.astype(np.float64)
    if vertically_enlarge and len(out_boxes):
        out_boxes = rect_ops.vertically_enlarge(out_boxes, enlarge_top=0.2)
    return out_boxes, out_conf


def unpack_packed_row(
    row: np.ndarray,
    capacities: Sequence[int],
    n_stages: int,
    plan,
    table,
    nms_on_device: bool,
    *,
    nms_mode: str,
    nms_min_neighbors: int,
    vertically_enlarge: bool,
    nms_eps: float = 0.2,
) -> DetectionResult:
    """Decode one image's packed result vector (models/cascade._pack_result
    layout) into a :class:`DetectionResult` — config-free: every knob the
    decode depends on is an explicit argument, so the live detector and the
    AOT serving path share one decoder and cannot drift."""
    cap_last = capacities[-1] if capacities else plan.n_windows
    window_ids = row[:cap_last].astype(np.int64)
    conf = row[cap_last : 2 * cap_last]
    alive = row[2 * cap_last : 3 * cap_last] > 0.5
    base = 3 * cap_last
    survivors = [int(s) for s in row[base : base + n_stages]]
    overflows = [int(s) for s in row[base + n_stages : base + 2 * n_stages - 1]]
    keep_ids = window_ids[alive]
    raw_boxes = table["coords_norm"][keep_ids]
    raw_conf = conf[alive]
    if nms_on_device:
        tail = row[base + 2 * n_stages - 1 :]
        cl_xywh = tail[: 4 * cap_last].reshape(cap_last, 4)
        cl_w = tail[4 * cap_last : 5 * cap_last]
        cl_keep = tail[5 * cap_last : 6 * cap_last] > 0.5
        boxes = np.stack(
            [
                cl_xywh[cl_keep, 0],
                cl_xywh[cl_keep, 1],
                cl_xywh[cl_keep, 0] + cl_xywh[cl_keep, 2],
                cl_xywh[cl_keep, 1] + cl_xywh[cl_keep, 3],
            ],
            axis=1,
        ).astype(np.float64)
        confidences = cl_w[cl_keep].astype(np.float64)
        if vertically_enlarge and len(boxes):
            boxes = rect_ops.vertically_enlarge(boxes, enlarge_top=0.2)
    else:
        boxes, confidences = postprocess_raw(
            raw_boxes,
            raw_conf,
            nms_mode=nms_mode,
            nms_min_neighbors=nms_min_neighbors,
            vertically_enlarge=vertically_enlarge,
            nms_eps=nms_eps,
        )
    return DetectionResult(
        boxes=boxes,
        confidences=confidences,
        raw_boxes=raw_boxes,
        raw_confidences=raw_conf,
        n_windows=plan.n_windows,
        n_survivors_per_stage=survivors,
        raw_window_ids=keep_ids,
        reextract_overflows=overflows,
    )


@dataclass
class ServingBundle:
    """An exported cascade: config-free metadata, the flat weight arrays
    (shared), and one program per capacity rung (they differ only in
    survivor-buffer capacities)."""

    meta: dict
    weights: List[np.ndarray]
    programs: List[jax_export.Exported]


def export_detector(
    model: CascadeModel,
    img_h: int,
    img_w: int,
    *,
    batch: Optional[int] = None,
    yuv: bool = False,
    capacities: Optional[Sequence[int]] = None,
    n_rungs: int = 3,
    resample_impl: Optional[str] = None,
    platforms: Optional[Sequence[str]] = None,
    mesh=None,
) -> ServingBundle:
    """Export the full cascade program for (img_h, img_w) frames.

    Every config knob the program depends on is resolved HERE, at export
    time, and recorded in the bundle metadata — the serving host never reads
    config. ``n_rungs``: how many saturation-escalation capacity rungs to
    ship (rung 0 = base capacities; each next rung is one
    ``escalate_capacities`` doubling, exactly the live detector's re-dispatch
    sequence). ``platforms``: e.g. ("tpu", "cpu") for a cross-platform
    artifact; None exports for the current default backend. ``resample_impl``
    defaults to the pure-XLA resampler, which lowers on every platform
    (the Pallas kernels are TPU-only).

    ``batch``: frames per program call (int), or ``"dynamic"`` to export a
    *symbolic* batch dimension (jax.export shape polymorphism): one program
    serves any frame count with no padding, and saturation re-runs dispatch
    a single frame instead of a padded batch. Each distinct concrete batch
    size still compiles its own executable on first use, so the serving
    loop chunks to a fixed hint (``inference_batch_frames`` at export time)
    to bound recompiles.

    ``mesh``: an optional ``jax.sharding.Mesh`` — the program is exported
    frame-sharded over the mesh's first axis (weights replicated), the
    multi-chip serving layout of ``CascadeDetector(mesh=...)``. The bundle
    records the device count; ``load_bundle`` must then be given a mesh of
    the same size. Requires a static ``batch`` divisible by the mesh size."""
    if model.n_nets < 2:
        raise ValueError("a cascade must consist of at least two nets")
    size0 = model.input_sizes[0]
    mwl = float(cf.get("min_window_length"))
    wsf = float(cf.get("window_scale_factor"))
    plan = build_plan(img_h, img_w, size0, size0, mwl, wsf)
    if plan.n_windows < 1:
        raise ValueError("Could not extract any windows at this image size")
    table = window_table(plan)
    coords_norm = jnp.asarray(table["coords_norm"], dtype=jnp.int32)
    boxes_float = jnp.asarray(table["boxes_float"], dtype=jnp.float32)
    n_stages = model.n_nets
    base_caps = tuple(
        capacities
        or cf.get("cascade_capacity_schedule")
        or casc.default_capacity_schedule(plan.n_windows, n_stages)
    )
    thresholds = tuple(casc.resolve_thresholds(n_stages))
    mode = str(cf.get("final_confidence_calculation"))
    extraction_mode = casc.resolve_extraction_mode(plan)
    high_precision = bool(cf.get("inference_high_precision"))
    chunk = int(cf.get("inference_chunk_size"))
    nms_mode = str(cf.get("nms"))
    nms_on_device = bool(cf.get("nms_on_device")) and nms_mode == cf.NMS_OPENCV
    nms_min_neighbors = int(cf.get("nms_opencv_min_neighbors"))
    nms_mn = nms_min_neighbors if nms_on_device else -1
    nms_eps = float(cf.get("nms_opencv_eps"))
    compaction = casc.resolve_compaction()
    impl = resample_impl or "xla"
    if impl == "pallas2dyn":
        raise ValueError(
            "the dynamic row-bounded kernel needs host-side overflow "
            "re-dispatch policy; export with 'xla', 'pallas' or 'pallas2'"
        )
    dynamic_batch = batch == "dynamic"
    chunk_hint = int(cf.get("inference_batch_frames"))
    if dynamic_batch:
        if mesh is not None:
            raise ValueError(
                "a mesh-sharded export needs a static batch (the batch axis "
                "is laid out over devices); pass an int batch"
            )
        (batch_dim,) = jax_export.symbolic_shape("b")
    else:
        batch = int(batch or chunk_hint)
        if mesh is not None and batch % mesh.devices.size != 0:
            raise ValueError(
                "batch {} is not divisible by the {}-device mesh".format(
                    batch, mesh.devices.size
                )
            )
        chunk_hint = batch
        batch_dim = batch

    stage_configs = tuple(model.stage_configs)
    params_device = tuple(
        jax.tree_util.tree_map(jnp.asarray, p) for p in model.stage_params
    )
    if not high_precision:
        # the same loop-invariant compute-dtype precast the live chunked path
        # applies (models/cascade._precast_params); bit-identical, halves the
        # shipped weight bytes for bf16 models
        params_device = tuple(
            casc._precast_params(p, c) for p, c in zip(params_device, stage_configs)
        )
    stats_device = tuple(
        (jnp.asarray(m), jnp.asarray(s))
        for m, s in zip(model.stage_means, model.stage_stds)
    )
    flat_params, params_treedef = jax.tree_util.tree_flatten(params_device)

    # capacity ladder: base + n_rungs-1 escalations (the detector's exact
    # saturation re-dispatch sequence)
    rungs = [list(base_caps)]
    while len(rungs) < max(1, n_rungs):
        nxt = casc.escalate_capacities(rungs[-1], plan.n_windows)
        if nxt is None:
            break
        rungs.append(nxt)

    def make_fn(caps: Tuple[int, ...]):
        def run(frame_args, flat):
            params = jax.tree_util.tree_unflatten(params_treedef, flat)
            common = (
                coords_norm,
                boxes_float,
                params,
                stats_device,
                plan,
                stage_configs,
                caps,
                mode,
                thresholds,
                high_precision,
                extraction_mode,
                chunk,
                nms_mn,
                impl,
                compaction,
                nms_eps,
            )
            if yuv:
                y, uv = frame_args
                return casc._cascade_infer_device_batch_yuv(y, uv, *common)
            (images,) = frame_args
            return casc._cascade_infer_device_batch(images, *common)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            axis = mesh.axis_names[0]
            frames_sh = NamedSharding(mesh, PartitionSpec(axis))
            rep = NamedSharding(mesh, PartitionSpec())
            wsh = [rep] * len(flat_params)
            if yuv:
                return jax.jit(
                    lambda y, uv, flat: run((y, uv), flat),
                    in_shardings=(frames_sh, frames_sh, wsh),
                    out_shardings=frames_sh,
                )
            return jax.jit(
                lambda images, flat: run((images,), flat),
                in_shardings=(frames_sh, wsh),
                out_shardings=frames_sh,
            )
        if yuv:
            return jax.jit(lambda y, uv, flat: run((y, uv), flat))
        return jax.jit(lambda images, flat: run((images,), flat))

    weight_specs = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in flat_params]
    if yuv:
        specs = (
            jax.ShapeDtypeStruct((batch_dim, img_h, img_w), jnp.uint8),
            jax.ShapeDtypeStruct((batch_dim, img_h // 2, img_w // 2, 2), jnp.uint8),
            weight_specs,
        )
    else:
        specs = (
            jax.ShapeDtypeStruct((batch_dim, img_h, img_w, 3), jnp.uint8),
            weight_specs,
        )

    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    programs = [
        jax_export.export(make_fn(tuple(caps)), **kwargs)(*specs) for caps in rungs
    ]
    weights = [np.asarray(a) for a in flat_params]

    meta = {
        "format_version": FORMAT_VERSION,
        "img_h": img_h,
        "img_w": img_w,
        "batch": "dynamic" if dynamic_batch else batch,
        "chunk_hint": chunk_hint,
        "yuv": yuv,
        "n_stages": n_stages,
        "size0": size0,
        "min_window_length": mwl,
        "window_scale_factor": wsf,
        "capacity_rungs": [list(map(int, caps)) for caps in rungs],
        "thresholds": [float(t) for t in thresholds],
        "confidence_mode": mode,
        "extraction_mode": extraction_mode,
        "resample_impl": impl,
        "chunk": chunk,
        "high_precision": high_precision,
        "compaction": compaction,
        "nms_mode": nms_mode,
        "nms_on_device": nms_on_device,
        "nms_min_neighbors": nms_min_neighbors,
        "nms_eps": nms_eps,
        "vertically_enlarge": bool(cf.get("vertically_enlarge_bboxes")),
        "platforms": list(programs[0].platforms),
        "weight_dtypes": [str(w.dtype) for w in weights],
        "nr_devices": int(programs[0].nr_devices),
        "mesh_axis": None if mesh is None else str(mesh.axis_names[0]),
    }
    return ServingBundle(meta=meta, weights=weights, programs=programs)


def export_window_sharded(
    model: CascadeModel,
    img_h: int,
    img_w: int,
    mesh,
    *,
    capacities: Optional[Sequence[int]] = None,
    n_rungs: int = 3,
    resample_impl: Optional[str] = None,
    platforms: Optional[Sequence[str]] = None,
) -> ServingBundle:
    """Export ONE image's cascade with the WINDOW axis sharded over ``mesh``
    (parallel/window_shard.py) as a serving bundle — the huge-pyramid
    multi-chip serving mode (FDDB-density images whose window batch exceeds
    one chip) as a deployable artifact. The bundle walks the same capacity
    ladder as the live window-sharded path's saturation re-dispatch loop.
    Loads into a :class:`WindowShardedServingDetector` via ``load_bundle``
    with a mesh of the recorded device count."""
    from .parallel import window_shard
    from .parallel.mesh import DATA_AXIS
    from jax.sharding import NamedSharding, PartitionSpec

    if model.n_nets < 2:
        raise ValueError("a cascade must consist of at least two nets")
    size0 = model.input_sizes[0]
    mwl = float(cf.get("min_window_length"))
    wsf = float(cf.get("window_scale_factor"))
    plan = build_plan(img_h, img_w, size0, size0, mwl, wsf)
    if plan.n_windows < 1:
        raise ValueError("Could not extract any windows at this image size")
    table = window_table(plan)
    coords_norm = jnp.asarray(table["coords_norm"], dtype=jnp.int32)
    n_stages = model.n_nets
    base_caps = tuple(
        capacities
        or cf.get("cascade_capacity_schedule")
        or casc.default_capacity_schedule(plan.n_windows, n_stages)
    )
    thresholds = tuple(casc.resolve_thresholds(n_stages))
    mode = str(cf.get("final_confidence_calculation"))
    extraction_mode = casc.resolve_extraction_mode(plan)
    chunk = int(cf.get("inference_chunk_size"))
    nms_mode = str(cf.get("nms"))
    compaction = casc.resolve_compaction()
    impl = resample_impl or "xla"
    if impl in ("pallas2", "pallas2dyn"):
        impl = "pallas"  # shard-local subsets can't use the full-plan kernels

    stage_configs = tuple(model.stage_configs)
    params_device = tuple(
        casc._precast_params(jax.tree_util.tree_map(jnp.asarray, p), c)
        for p, c in zip(model.stage_params, stage_configs)
    )
    stats_device = tuple(
        (jnp.asarray(m), jnp.asarray(s))
        for m, s in zip(model.stage_means, model.stage_stds)
    )
    flat_params, params_treedef = jax.tree_util.tree_flatten(params_device)
    n_dev = mesh.devices.size
    n0 = plan.n_windows
    n0_pad = window_shard._pad_len(n0, n_dev)

    rungs = [list(base_caps)]
    while len(rungs) < max(1, n_rungs):
        nxt = casc.escalate_capacities(rungs[-1], plan.n_windows)
        if nxt is None:
            break
        rungs.append(nxt)

    rep = NamedSharding(mesh, PartitionSpec())
    row_sharded = NamedSharding(mesh, PartitionSpec(DATA_AXIS, None))

    def make_fn(caps: Tuple[int, ...]):
        def run(image, boxes_padded, flat):
            params = jax.tree_util.tree_unflatten(params_treedef, flat)
            return window_shard.cascade_infer_window_sharded(
                image,
                coords_norm,
                boxes_padded,
                n0,
                params,
                stats_device,
                plan,
                stage_configs,
                caps,
                mode,
                thresholds,
                mesh,
                chunk,
                impl,
                compaction,
                extraction_mode,
            )

        return jax.jit(
            run,
            in_shardings=(rep, row_sharded, [rep] * len(flat_params)),
        )

    specs = (
        jax.ShapeDtypeStruct((img_h, img_w, 3), jnp.uint8),
        jax.ShapeDtypeStruct((n0_pad, 4), jnp.float32),
        [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in flat_params],
    )
    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    programs = [
        jax_export.export(make_fn(tuple(caps)), **kwargs)(*specs) for caps in rungs
    ]
    weights = [np.asarray(a) for a in flat_params]
    meta = {
        "format_version": FORMAT_VERSION,
        "kind": "window_sharded",
        "img_h": img_h,
        "img_w": img_w,
        "n_stages": n_stages,
        "size0": size0,
        "min_window_length": mwl,
        "window_scale_factor": wsf,
        "capacity_rungs": [list(map(int, caps)) for caps in rungs],
        "thresholds": [float(t) for t in thresholds],
        "confidence_mode": mode,
        "extraction_mode": extraction_mode,
        "resample_impl": impl,
        "chunk": chunk,
        "compaction": compaction,
        "nms_mode": nms_mode,
        "nms_min_neighbors": int(cf.get("nms_opencv_min_neighbors")),
        "vertically_enlarge": bool(cf.get("vertically_enlarge_bboxes")),
        "platforms": list(programs[0].platforms),
        "weight_dtypes": [str(w.dtype) for w in weights],
        "nr_devices": int(programs[0].nr_devices),
        "mesh_axis": DATA_AXIS,
        "n0_pad": n0_pad,
    }
    return ServingBundle(meta=meta, weights=weights, programs=programs)


def save_bundle(bundle: ServingBundle, dir_path: str) -> None:
    """Write ``meta.json`` + ``weights.npz`` + one ``program_<rung>.bin`` per
    capacity rung. bfloat16 arrays are stored as uint16 views (npz has no
    bfloat16) and re-viewed on load per meta's ``weight_dtypes``."""
    os.makedirs(dir_path, exist_ok=True)
    with open(os.path.join(dir_path, "meta.json"), "w") as f:
        json.dump(bundle.meta, f, indent=1)
    arrays = {}
    for i, w in enumerate(bundle.weights):
        arrays[f"w{i}"] = w.view(np.uint16) if w.dtype.name == "bfloat16" else w
    np.savez(os.path.join(dir_path, "weights.npz"), **arrays)
    for i, prog in enumerate(bundle.programs):
        with open(os.path.join(dir_path, f"program_{i}.bin"), "wb") as f:
            f.write(prog.serialize())


def load_bundle(dir_path: str, mesh=None) -> "ServingDetector":
    """Load a saved bundle into a ready :class:`ServingDetector` (no model,
    no config — the artifact is self-contained). Mesh-sharded bundles
    (exported with ``mesh=``) need a ``mesh`` of the recorded device count."""
    import ml_dtypes

    with open(os.path.join(dir_path, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("format_version") != FORMAT_VERSION:
        raise ValueError(
            "unsupported bundle format {} (this build reads {})".format(
                meta.get("format_version"), FORMAT_VERSION
            )
        )
    with np.load(os.path.join(dir_path, "weights.npz")) as z:
        weights = []
        for i, dt in enumerate(meta["weight_dtypes"]):
            w = z[f"w{i}"]
            if dt == "bfloat16":
                w = w.view(ml_dtypes.bfloat16)
            weights.append(w)
    programs = []
    for i in range(len(meta["capacity_rungs"])):
        with open(os.path.join(dir_path, f"program_{i}.bin"), "rb") as f:
            programs.append(jax_export.deserialize(f.read()))
    bundle = ServingBundle(meta=meta, weights=weights, programs=programs)
    if meta.get("kind") == "window_sharded":
        return WindowShardedServingDetector(bundle, mesh=mesh)
    return ServingDetector(bundle, mesh=mesh)


class ServingDetector:
    """Serve detections from an exported bundle.

    Mirrors ``CascadeDetector.detect_batch`` semantics for fixed-size frames:
    frames are chunked to the exported batch size (short chunks padded by
    repeating the last frame), saturated images walk the bundle's capacity
    ladder exactly like the live detector's re-dispatch loop, and a top-rung
    saturation warns and truncates (the artifact can't grow new programs)."""

    def __init__(self, bundle: ServingBundle, mesh=None):
        self.meta = bundle.meta
        self.programs = bundle.programs
        nr = int(self.meta.get("nr_devices", 1))
        self._frames_sharding = None
        if nr > 1:
            if mesh is None or mesh.devices.size != nr:
                raise ValueError(
                    "this bundle was exported frame-sharded over {} devices; "
                    "pass load_bundle(..., mesh=) with a {}-device mesh".format(
                        nr, nr
                    )
                )
            from jax.sharding import NamedSharding, PartitionSpec

            self._frames_sharding = NamedSharding(
                mesh, PartitionSpec(self.meta["mesh_axis"])
            )
            rep = NamedSharding(mesh, PartitionSpec())
            self._weights = [
                jax.device_put(w, rep) for w in bundle.weights
            ]
        else:
            # device-resident once; every rung call reuses the same buffers
            self._weights = [jnp.asarray(w) for w in bundle.weights]
        m = self.meta
        self._plan = build_plan(
            m["img_h"],
            m["img_w"],
            m["size0"],
            m["size0"],
            m["min_window_length"],
            m["window_scale_factor"],
        )
        self._table = window_table(self._plan)
        self._warned = False

    # -- helpers ---------------------------------------------------------
    def _frame_shape_ok(self, frame) -> bool:
        m = self.meta
        if m["yuv"]:
            y, uv = frame
            return y.shape == (m["img_h"], m["img_w"]) and uv.shape == (
                m["img_h"] // 2,
                m["img_w"] // 2,
                2,
            )
        return frame.shape == (m["img_h"], m["img_w"], 3)

    def _dispatch_rung(self, rung: int, frames: List):
        """Dispatch one exported program over exactly `batch` frames; returns
        the device result (asynchronous — np.asarray blocks on it)."""
        m = self.meta

        def place(a):
            if self._frames_sharding is not None:
                return jax.device_put(a, self._frames_sharding)
            return jnp.asarray(a)

        if m["yuv"]:
            y = place(np.stack([f[0] for f in frames]))
            uv = place(np.stack([f[1] for f in frames]))
            return self.programs[rung].call(y, uv, self._weights)
        stack = place(np.stack(frames))
        return self.programs[rung].call(stack, self._weights)

    def _unpack(self, row: np.ndarray, rung: int) -> DetectionResult:
        m = self.meta
        return unpack_packed_row(
            row,
            m["capacity_rungs"][rung],
            m["n_stages"],
            self._plan,
            self._table,
            m["nms_on_device"],
            nms_mode=m["nms_mode"],
            nms_min_neighbors=m["nms_min_neighbors"],
            vertically_enlarge=m["vertically_enlarge"],
            nms_eps=float(m.get("nms_eps", 0.2)),
        )

    def _saturated(self, result: DetectionResult, rung: int) -> bool:
        return casc.CascadeDetector._is_saturated(
            result.n_survivors_per_stage,
            self.meta["capacity_rungs"][rung],
            result.reextract_overflows,
        )

    # -- public ----------------------------------------------------------
    def detect(self, frame) -> DetectionResult:
        return self.detect_batch([frame])[0]

    def detect_batch(
        self, frames: Sequence, pipeline_depth: int = 2
    ) -> List[DetectionResult]:
        """``pipeline_depth``: chunks kept in flight so the next chunk's
        upload/compute overlaps the current fetch — the same bounded software
        pipeline as the live detector's serving loop."""
        m = self.meta
        for f in frames:
            if not self._frame_shape_ok(f):
                raise ValueError(
                    "frame shape does not match the exported program "
                    "({}x{}, yuv={})".format(m["img_h"], m["img_w"], m["yuv"])
                )
        dynamic = m["batch"] == "dynamic"
        step = int(m.get("chunk_hint") or 16) if dynamic else m["batch"]
        # saturation re-runs: a single frame under a dynamic batch, a padded
        # batch otherwise (the static program admits exactly one shape)
        rerun_n = 1 if dynamic else step
        results: List[Optional[DetectionResult]] = [None] * len(frames)
        pending: List[Tuple[List[int], object]] = []

        def finish(chunk_idx, packed_dev):
            packed = np.asarray(packed_dev)
            for j, i in enumerate(chunk_idx):
                result = self._unpack(packed[j], 0)
                rung = 0
                while self._saturated(result, rung) and rung + 1 < len(
                    self.programs
                ):
                    rung += 1
                    re_packed = np.asarray(
                        self._dispatch_rung(rung, [frames[i]] * rerun_n)
                    )
                    result = self._unpack(re_packed[0], rung)
                if self._saturated(result, rung) and not self._warned:
                    log.log(
                        "WARNING: cascade stage saturated the bundle's top "
                        "capacity rung; excess windows were dropped. Export "
                        "with more rungs (n_rungs) or larger capacities."
                    )
                    self._warned = True
                results[i] = result

        for s in range(0, len(frames), step):
            chunk_idx = list(range(s, min(s + step, len(frames))))
            chunk = [frames[i] for i in chunk_idx]
            pad = 0 if dynamic else step - len(chunk)
            pending.append(
                (chunk_idx, self._dispatch_rung(0, chunk + [chunk[-1]] * pad))
            )
            if len(pending) > max(1, pipeline_depth):
                finish(*pending.pop(0))
        while pending:
            finish(*pending.pop(0))
        return results  # type: ignore[return-value]


class WindowShardedServingDetector:
    """Serve single huge-pyramid images from a window-sharded bundle.

    Mirrors ``parallel.window_shard.detect_window_sharded`` semantics: the
    window axis of one image is sharded over the mesh, survivor tuples are
    all-gathered at each compaction, and a saturated result walks the
    bundle's capacity ladder (the live path's re-dispatch sequence)."""

    def __init__(self, bundle: ServingBundle, mesh=None):
        from jax.sharding import NamedSharding, PartitionSpec

        self.meta = bundle.meta
        self.programs = bundle.programs
        m = self.meta
        nr = int(m.get("nr_devices", 1))
        if mesh is None or mesh.devices.size != nr:
            raise ValueError(
                "this bundle was exported window-sharded over {} devices; "
                "pass load_bundle(..., mesh=) with a {}-device mesh".format(nr, nr)
            )
        rep = NamedSharding(mesh, PartitionSpec())
        row_sharded = NamedSharding(mesh, PartitionSpec(m["mesh_axis"], None))
        self._weights = [jax.device_put(w, rep) for w in bundle.weights]
        self._plan = build_plan(
            m["img_h"],
            m["img_w"],
            m["size0"],
            m["size0"],
            m["min_window_length"],
            m["window_scale_factor"],
        )
        self._table = window_table(self._plan)
        # the padded window-box table the program consumes, placed sharded
        # over the mesh rows exactly like the live path (an in-jit pad would
        # enter replicated and force a GSPMD re-shard)
        boxes_np = np.asarray(self._table["boxes_float"], np.float32)
        pad = m["n0_pad"] - boxes_np.shape[0]
        boxes_padded = np.concatenate(
            [boxes_np, np.broadcast_to(boxes_np[-1:], (pad, 4))]
        )
        self._boxes_dev = jax.device_put(boxes_padded, row_sharded)
        self._warned = False

    def detect(self, image: np.ndarray) -> DetectionResult:
        m = self.meta
        if image.shape != (m["img_h"], m["img_w"], 3):
            raise ValueError(
                "image shape {} does not match the exported program "
                "({}x{})".format(image.shape, m["img_h"], m["img_w"])
            )
        image_dev = jnp.asarray(image)

        def decode(out, rung):
            window_ids, conf, alive, survivors = out
            window_ids = np.asarray(window_ids)
            conf = np.asarray(conf)
            alive = np.asarray(alive)
            survivors_int = [int(s) for s in np.asarray(survivors)]
            keep_ids = window_ids[alive]
            raw_boxes = self._table["coords_norm"][keep_ids]
            raw_conf = conf[alive]
            boxes, confidences = postprocess_raw(
                raw_boxes,
                raw_conf,
                nms_mode=m["nms_mode"],
                nms_min_neighbors=m["nms_min_neighbors"],
                vertically_enlarge=m["vertically_enlarge"],
                nms_eps=float(m.get("nms_eps", 0.2)),
            )
            return DetectionResult(
                boxes=boxes,
                confidences=confidences,
                raw_boxes=raw_boxes,
                raw_confidences=raw_conf,
                n_windows=self._plan.n_windows,
                n_survivors_per_stage=survivors_int,
                raw_window_ids=keep_ids,
            )

        rung = 0
        result = decode(
            self.programs[rung].call(image_dev, self._boxes_dev, self._weights),
            rung,
        )
        while (
            casc.CascadeDetector._is_saturated(
                result.n_survivors_per_stage, m["capacity_rungs"][rung]
            )
            and rung + 1 < len(self.programs)
        ):
            rung += 1
            result = decode(
                self.programs[rung].call(
                    image_dev, self._boxes_dev, self._weights
                ),
                rung,
            )
        if (
            casc.CascadeDetector._is_saturated(
                result.n_survivors_per_stage, m["capacity_rungs"][rung]
            )
            and not self._warned
        ):
            log.log(
                "WARNING: window-sharded bundle saturated its top capacity "
                "rung; excess windows were dropped. Export with more rungs."
            )
            self._warned = True
        return result
