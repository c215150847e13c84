"""Cross-platform serving bundle: ONE artifact, executed on TPU *and* CPU.

Roadmap item: bundles exported with platforms=("tpu", "cpu") lower for both
platforms, but had only ever been *executed* on the platform they were
exported from. This tool closes the loop inside this single environment:

1. (parent, tunneled-TPU backend) export the trained flagship's cascade
   program with platforms=("tpu", "cpu"), save the bundle to disk, reload it
   and detect N synthetic scenes ON THE TPU;
2. (child subprocess, CPU backend, sanitized env) load the SAME on-disk
   bundle, regenerate the same scenes, detect ON CPU;
3. compare: per-scene detection boxes/confidences must agree (boxes to float
   rounding, confidences to a small cross-platform numeric tolerance — the
   program's bf16 matmuls execute on different units on the two platforms).

The expensive measure phase (export ~11 min, CPU detect ~5 min) is cached
under ``rodc_output/cross_platform_cache/<key>/`` keyed on the flagship
weight bytes + every exported knob, so re-running the *comparison* after a
code or analysis change costs seconds (``--recompare`` skips the measure
phase entirely and replays the cached raw detections).

Writes artifacts/cross_platform_check.json. The CPU-only half (multi-platform
export loads + executes under the CPU backend) also runs in CI:
tests/test_serve.py::test_bundle_multi_platform_export.

Usage: python tools/cross_platform_bundle.py [--recompare]
"""

import hashlib
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from contextlib import nullcontext as _nullcontext

IMG_H, IMG_W = 240, 320
N_SCENES = 8
BATCH = 4
CAPS = [2048, 512]
CACHE_ROOT = os.path.join(REPO, "rodc_output", "cross_platform_cache")
# bump to invalidate cached raw detections when the measure phase changes
MEASURE_VERSION = 2


def _scenes():
    from rapidobjectdetectionusingcascadedcnns_tpu.data import synthetic

    return [
        synthetic.make_scene(
            IMG_H, IMG_W, n_faces=2, seed=s, min_face=40, max_face=100
        ).image
        for s in range(N_SCENES)
    ]


def _detections_to_jsonable(results):
    return [
        {
            "boxes": [[float(v) for v in b] for b in r.boxes],
            "confidences": [float(c) for c in r.confidences],
            # pre-NMS survivor set: the evidence base for window-level
            # cross-platform flip analysis (compare_detections)
            "raw_ids": [int(v) for v in r.raw_window_ids],
            "raw_confs": [float(v) for v in r.raw_confidences],
            "raw_boxes": [[float(v) for v in b] for b in r.raw_boxes],
        }
        for r in results
    ]


def _child(bundle_dir: str, out_path: str) -> None:
    from rapidobjectdetectionusingcascadedcnns_tpu import serve

    import jax

    det = serve.load_bundle(bundle_dir)
    t0 = time.perf_counter()
    results = det.detect_batch(_scenes())
    detect_s = time.perf_counter() - t0
    with open(out_path, "w") as f:
        json.dump(
            {
                "platform": jax.devices()[0].platform,
                "detect_s": detect_s,
                "detections": _detections_to_jsonable(results),
            },
            f,
        )


def _analyze_extra(extra, present, absent, nms_min_neighbors, threshold, conf_eps,
                   nms_eps=0.2):
    """Window-level evidence for one unmatched detection cluster.

    ``present``/``absent`` are the per-scene dicts of the side that emitted
    the extra cluster and the other side. Returns the evidence dict; its
    ``borderline`` field is True iff the cluster is fully explained by
    survivor windows that (a) exist only on the present side, (b) all sit
    within ``conf_eps`` of the decision threshold (LAST_STEP confidence:
    the final-stage gate is ``prob > threshold``), and (c) without which the
    shared remainder could not have met the ``min_neighbors`` bar. That is
    the exact signature of a correlated borderline *patch*: overlapping
    windows share pixels, so one near-threshold face-like patch flips its
    whole window cluster together when bf16 rounding differs across
    platforms. Anything else stays a hard mismatch.
    """
    import numpy as np

    from rapidobjectdetectionusingcascadedcnns_tpu.ops import nms as nms_ops

    raw_boxes = np.asarray(present["raw_boxes"], float).reshape(-1, 4)
    raw_confs = np.asarray(present["raw_confs"], float)
    raw_ids = np.asarray(present["raw_ids"], np.int64)
    other_ids = set(int(v) for v in absent["raw_ids"])

    # cluster membership: SimilarRects(window, cluster representative) with
    # the production eps — the same predicate groupRectangles clustered by
    x0, y0, x1, y1 = extra["box"]
    rep_xywh = np.array([[x0, y0, x1 - x0, y1 - y0]])
    win_xywh = np.stack(
        [
            raw_boxes[:, 0],
            raw_boxes[:, 1],
            raw_boxes[:, 2] - raw_boxes[:, 0],
            raw_boxes[:, 3] - raw_boxes[:, 1],
        ],
        axis=1,
    )
    sim = nms_ops._similarity_matrix(
        np.concatenate([rep_xywh, win_xywh], axis=0), eps=nms_eps
    )[0, 1:]
    members = np.nonzero(sim)[0]
    flipped = [
        {"window_id": int(raw_ids[m]), "conf": float(raw_confs[m])}
        for m in members
        if int(raw_ids[m]) not in other_ids
    ]
    n_shared = int(len(members) - len(flipped))
    borderline = (
        len(flipped) > 0
        and n_shared <= nms_min_neighbors
        and all(f["conf"] <= threshold + conf_eps for f in flipped)
    )
    return {
        "n_members": int(len(members)),
        "n_shared": n_shared,
        "flipped_windows": flipped,
        "threshold": threshold,
        "conf_eps": conf_eps,
        "borderline": borderline,
    }


def _replay_nms(raw_boxes, raw_confs, nms):
    """Re-run the PRODUCTION NMS path on a pre-NMS survivor set.

    ``nms`` carries the knobs recorded in the bundle metadata (not the live
    config — ADVICE r4): when the bundle ran with ``nms_on_device`` the
    reported boxes came from the jitted ``group_rectangles_jax`` tail decoded
    by serve.unpack_packed_row (serve.py:111-127), so the replay runs that
    same implementation (it is platform-deterministic: integer window coords
    in f32, HIGHEST-precision count matmuls); otherwise the host
    ``serve.postprocess_raw`` path is replayed.
    """
    import numpy as np

    from rapidobjectdetectionusingcascadedcnns_tpu import serve
    from rapidobjectdetectionusingcascadedcnns_tpu.ops import (
        nms as nms_ops,
        rectangles as rect_ops,
    )

    raw_boxes = np.asarray(raw_boxes, float).reshape(-1, 4)
    raw_confs = np.asarray(raw_confs, float)
    if not nms.get("nms_on_device"):
        return serve.postprocess_raw(
            raw_boxes,
            raw_confs,
            nms_mode=nms["nms_mode"],
            nms_min_neighbors=nms["nms_min_neighbors"],
            vertically_enlarge=nms["vertically_enlarge"],
            nms_eps=float(nms.get("nms_eps", 0.2)),
        )
    import jax
    import jax.numpy as jnp

    if len(raw_boxes) == 0:
        return np.zeros((0, 4), np.float64), np.zeros((0,), np.float64)
    xywh = np.stack(
        [
            raw_boxes[:, 0],
            raw_boxes[:, 1],
            raw_boxes[:, 2] - raw_boxes[:, 0],
            raw_boxes[:, 3] - raw_boxes[:, 1],
        ],
        axis=1,
    )
    # the jitted NMS is platform-deterministic (integer window coords in
    # f32, HIGHEST-precision count matmuls) — pin the replay to the LOCAL
    # CPU backend: each distinct survivor count n is its own program shape,
    # and compiling one per scene through the tunneled TPU backend costs
    # 20-40 s each for a millisecond of work
    try:
        cpu_dev = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu_dev = None
    ctx = jax.default_device(cpu_dev) if cpu_dev is not None else _nullcontext()
    with ctx:
        avg, weights, keep = nms_ops.group_rectangles_jax(
            jnp.asarray(xywh, jnp.float32),
            jnp.ones((len(xywh),), bool),
            nms["nms_min_neighbors"],
            eps=float(nms.get("nms_eps", 0.2)),
        )
    avg = np.asarray(avg)[np.asarray(keep)]
    weights = np.asarray(weights)[np.asarray(keep)]
    boxes = np.stack(
        [avg[:, 0], avg[:, 1], avg[:, 0] + avg[:, 2], avg[:, 1] + avg[:, 3]],
        axis=1,
    ).astype(np.float64)
    if nms["vertically_enlarge"] and len(boxes):
        boxes = rect_ops.vertically_enlarge(boxes, enlarge_top=0.2)
    return boxes, weights.astype(np.float64)


def _replay_side(side, nms):
    """Re-run the production NMS on one side's pre-NMS survivor set and check
    it reproduces that side's reported detections (order-insensitive, within
    the check's own matched-box tolerances: 1 px / 0.05 confidence).
    Validates that the divergence entered BEFORE NMS (survivor-set flips),
    not inside it."""
    import numpy as np

    boxes, confs = _replay_nms(side["raw_boxes"], side["raw_confs"], nms)
    rep_boxes = np.asarray(side["boxes"], float).reshape(-1, 4)
    rep_confs = np.asarray(side["confidences"], float)
    if len(boxes) != len(rep_boxes):
        return {"ok": False, "n_replay": int(len(boxes)), "n_reported": int(len(rep_boxes))}
    worst_box = 0.0
    worst_conf = 0.0
    unused = list(range(len(boxes)))
    for j in range(len(rep_boxes)):
        dists = [float(np.abs(rep_boxes[j] - boxes[k]).max()) for k in unused]
        pick = int(np.argmin(dists))
        k = unused.pop(pick)
        worst_box = max(worst_box, dists[pick])
        worst_conf = max(worst_conf, float(abs(rep_confs[j] - confs[k])))
    return {
        "ok": worst_box <= 1.0 and worst_conf <= 0.05,
        "max_box_delta": worst_box,
        "max_conf_delta": worst_conf,
    }


def _counterfactual_extra(extra, present, absent, flips, nms):
    """Scene-scoped evidence → THIS extra (ADVICE r4): apply only the
    survivor flips local to the extra (windows intersecting its box — a
    phase-2 container window or a bridging window both intersect it) to the
    ABSENT side's survivor set and replay the production NMS. If the extra
    now appears (a replayed box within 1 px), those local flips jointly
    produce it; otherwise the connection is non-local and only the full
    scene replay explains it."""
    import numpy as np

    x0, y0, x1, y1 = extra["box"]
    flip_ids = {f["window_id"] for f in flips}
    p_ids = [int(i) for i in present["raw_ids"]]
    p_by_id = {
        i: (b, c)
        for i, b, c in zip(p_ids, present["raw_boxes"], present["raw_confs"])
    }

    def _intersects(b):
        return b[0] < x1 and b[2] > x0 and b[1] < y1 and b[3] > y0

    local_add = [
        i
        for i in p_ids
        if i in flip_ids and i not in set(absent["raw_ids"]) and _intersects(p_by_id[i][0])
    ]
    a_ids = [int(i) for i in absent["raw_ids"]]
    a_keep = [
        j
        for j, i in enumerate(a_ids)
        if not (i in flip_ids and i not in p_by_id and _intersects(absent["raw_boxes"][j]))
    ]
    n_removed = len(a_ids) - len(a_keep)
    boxes = [absent["raw_boxes"][j] for j in a_keep] + [p_by_id[i][0] for i in local_add]
    confs = [absent["raw_confs"][j] for j in a_keep] + [p_by_id[i][1] for i in local_add]
    out_boxes, _ = _replay_nms(boxes, confs, nms)
    appeared = bool(
        len(out_boxes)
        and np.min(
            np.abs(np.asarray(out_boxes) - np.asarray(extra["box"])[None, :]).max(
                axis=1
            )
        )
        <= 1.0
    )
    return {
        "n_local_flips": len(local_add) + n_removed,
        "extra_appears_with_local_flips": appeared,
    }


def _probe_windows(requests, meta):
    """Per-stage counterfactual foreground probabilities for specific
    windows of specific scenes, computed on THIS process's JAX backend with
    the exact compute knobs recorded in the bundle metadata (extraction
    mode, resample impl, precision, chunking, bf16 precast) — the same
    kernels the exported program ran.

    Why this exists: a survivor window that flips across platforms carries
    only its FINAL-stage confidence in the raw record; when the flip happens
    at an EARLIER stage gate (p_d on one side a hair above that stage's
    threshold, a hair below on the other — bf16 matmuls on different units),
    the final confidence looks solid and the borderline mechanism is
    invisible. This probe recovers the per-stage margins on both platforms.

    ``requests``: {scene_idx: [window_id, ...]};
    returns {"<scene>:<wid>": [p0, p1, ...]}.
    """
    import jax
    import jax.numpy as jnp

    from rapidobjectdetectionusingcascadedcnns_tpu.models import cascade as casc
    from rapidobjectdetectionusingcascadedcnns_tpu.ops.pyramid import (
        build_plan,
        window_table,
    )

    import numpy as np

    import train_flagship

    model = train_flagship.load_flagship()
    assert model is not None, "flagship artifact missing for the stage probe"

    size0 = model.input_sizes[0]
    plan = build_plan(
        meta["img_h"], meta["img_w"], size0, size0,
        meta["min_window_length"], meta["window_scale_factor"],
    )
    table = window_table(plan)
    coords_norm = jnp.asarray(table["coords_norm"], jnp.int32)
    boxes_float = jnp.asarray(table["boxes_float"], jnp.float32)
    hp = bool(meta["high_precision"])
    chunk = int(meta["chunk"])
    emode = str(meta["extraction_mode"])
    impl = str(meta["resample_impl"])
    impl_re = "pallas" if impl in ("pallas2", "pallas2dyn") else impl
    params = tuple(
        jax.tree_util.tree_map(jnp.asarray, p) for p in model.stage_params
    )
    if not hp:
        params = tuple(
            casc._precast_params(p, c) for p, c in zip(params, model.stage_configs)
        )
    stats = tuple(
        (jnp.asarray(m), jnp.asarray(s))
        for m, s in zip(model.stage_means, model.stage_stds)
    )

    scenes = _scenes()
    out = {}
    for scene_idx, wids in sorted(requests.items()):
        image_f = jnp.asarray(scenes[int(scene_idx)], jnp.float32)
        probs0, bneck0, ids0, valid0 = casc._stage0_apply(
            image_f, boxes_float, plan, params[0], model.stage_configs[0],
            stats[0][0], stats[0][1], chunk, emode, impl, hp,
        )
        p0_rows = np.asarray(probs0)[:, 1]
        b0_rows = np.asarray(bneck0)
        if ids0 is not None:
            ids0 = np.asarray(ids0)
            valid0 = np.asarray(valid0)
            p0 = np.full(plan.n_windows, np.nan)
            b0 = np.zeros((plan.n_windows, b0_rows.shape[1]), b0_rows.dtype)
            p0[ids0[valid0]] = p0_rows[valid0]
            b0[ids0[valid0]] = b0_rows[valid0]
        else:
            p0, b0 = p0_rows, b0_rows
        sel = np.asarray(sorted(int(w) for w in wids), np.int64)
        stage_probs = [p0[sel]]
        # stages >= 1 re-extract from the INT window coords exactly like the
        # traced core (models/cascade._cascade_core: coords_norm[window_ids])
        sel_boxes = coords_norm[jnp.asarray(sel)].astype(jnp.float32)
        bneck = jnp.asarray(b0[sel])
        for s in range(1, model.n_nets):
            bneck_in = (
                bneck
                if model.stage_configs[s].bottleneck_in_size is not None
                else None
            )
            probs_s, bneck = casc._apply_stage_on_boxes_chunked(
                image_f, sel_boxes, bneck_in, params[s], model.stage_configs[s],
                stats[s][0], stats[s][1], chunk, hp, impl_re,
            )
            stage_probs.append(np.asarray(probs_s)[:, 1])
        for j, wid in enumerate(sel):
            out["{}:{}".format(scene_idx, int(wid))] = [
                float(ps[j]) for ps in stage_probs
            ]
    return out


def _probe_child(req_path: str, out_path: str) -> None:
    with open(req_path) as f:
        req = json.load(f)
    result = _probe_windows(
        {int(k): v for k, v in req["requests"].items()}, req["meta"]
    )
    import jax

    with open(out_path, "w") as f:
        json.dump(
            {"platform": jax.devices()[0].platform, "probes": result}, f
        )


def _flip_stage_margin(flip, scene_idx, stage_probes, thresholds, conf_eps):
    """Stage-level borderline evidence for one survivor flip whose final
    confidence is NOT near the final threshold: find the first stage where
    the two platforms' gate decisions diverge and require both platforms'
    probabilities there to sit within ``conf_eps`` of that stage's
    threshold. Returns the evidence dict or None when no probe exists."""
    if not stage_probes:
        return None
    key = "{}:{}".format(scene_idx, flip["window_id"])
    pt = stage_probes.get("tpu", {}).get(key)
    pc = stage_probes.get("cpu", {}).get(key)
    if pt is None or pc is None:
        return None
    # (a) the probe itself reproduces a differing gate decision, or (b) the
    # probe (which runs the window in its own small chunk, not the bundle's
    # full survivor batch) lands on the same side on both platforms but
    # WITHIN eps of a stage gate — the bundle's batch-composition bf16
    # rounding is what flipped it, and a probability this close to the gate
    # is the borderline signature either way (scene 5's window 1471:
    # p1 = 0.30007 against the 0.3 stage-1 gate)
    best = None
    for d, (a_p, b_p) in enumerate(zip(pt, pc)):
        thr_d = thresholds[d]
        rec = {
            "divergent_stage": d,
            "p_tpu": round(a_p, 6),
            "p_cpu": round(b_p, 6),
            "stage_threshold": thr_d,
            "margin_tpu": round(a_p - thr_d, 6),
            "margin_cpu": round(b_p - thr_d, 6),
            "worst_margin": round(
                max(abs(a_p - thr_d), abs(b_p - thr_d)), 6
            ),
        }
        if (a_p > thr_d) != (b_p > thr_d):
            rec["stage_borderline"] = (
                abs(a_p - thr_d) <= conf_eps and abs(b_p - thr_d) <= conf_eps
            )
            rec["mechanism"] = "probe_reproduces_gate_flip"
            return rec
        if best is None or rec["worst_margin"] < best["worst_margin"]:
            best = rec
    best["stage_borderline"] = best["worst_margin"] <= conf_eps
    best["mechanism"] = (
        "within_eps_of_stage_gate (probe chunk composition differs from the "
        "bundle's full survivor batch, so the exact bf16 rounding that "
        "flipped the gate is not reproduced; the probed probability sits "
        "within conf_eps of the gate on BOTH platforms)"
    )
    return best


def _analyze_scene(a, b, threshold, conf_eps, nms, scene_idx=None,
                   stage_probes=None, thresholds=None):
    """Scene-level evidence for a cluster-topology divergence.

    The per-cluster analysis (:func:`_analyze_extra`) only sees windows
    similar to the unmatched cluster itself — but survivor flips *elsewhere*
    in the scene can change the clustering topology (a flipped bridging
    window merges two clusters; a flipped member tips a neighboring cluster
    over the groupRectangles phase-2 containment size test), moving a
    detection that shares all its member windows across both platforms.

    This is judged borderline iff (a) the symmetric difference of the two
    pre-NMS survivor sets is non-empty and every differing window is proven
    borderline — its final confidence within ``conf_eps`` of the final
    threshold, OR the per-stage probe (:func:`_probe_windows`) shows both
    platforms within ``conf_eps`` of the threshold at the stage gate where
    their decisions diverge (an early-stage bf16 flip whose final confidence
    looks solid) — and (b) replaying the production NMS (per the bundle's
    recorded knobs) on each side's own survivor set reproduces that side's
    reported detections — proving the divergence is entirely pre-NMS
    survivor flips, not an NMS implementation drift.
    """
    a_conf = {int(i): float(c) for i, c in zip(a["raw_ids"], a["raw_confs"])}
    b_conf = {int(i): float(c) for i, c in zip(b["raw_ids"], b["raw_confs"])}
    flips = [
        {"window_id": i, "conf": c, "side": "tpu"}
        for i, c in a_conf.items()
        if i not in b_conf
    ] + [
        {"window_id": i, "conf": c, "side": "cpu"}
        for i, c in b_conf.items()
        if i not in a_conf
    ]
    all_borderline = len(flips) > 0
    for f in flips:
        if f["conf"] <= threshold + conf_eps:
            f["borderline_at"] = "final_threshold"
            continue
        margin = _flip_stage_margin(
            f, scene_idx, stage_probes, thresholds or [threshold], conf_eps
        )
        if margin is not None:
            f["stage_margin"] = margin
        if margin is not None and margin["stage_borderline"]:
            f["borderline_at"] = "stage_gate"
        else:
            all_borderline = False
    replay_a = _replay_side(a, nms)
    replay_b = _replay_side(b, nms)
    borderline = all_borderline and replay_a["ok"] and replay_b["ok"]
    return {
        "mechanism": "topology_flip",
        "scene_flips": flips,
        "replay_a": replay_a,
        "replay_b": replay_b,
        "threshold": threshold,
        "conf_eps": conf_eps,
        "borderline": borderline,
    }


def compare_detections(
    tpu,
    cpu,
    nms_min_neighbors: int,
    threshold: float = None,
    conf_eps: float = 0.05,
    nms_mode: str = "NMS_OPENCV",
    vertically_enlarge: bool = False,
    nms_on_device: bool = False,
    stage_probes: dict = None,
    stage_thresholds: list = None,
    nms_eps: float = 0.2,
) -> dict:
    """Order-insensitive per-scene comparison with window-level flip analysis.

    The bundle's bf16 matmuls execute on different units on the two
    platforms, so a window whose cascade confidence sits exactly on the
    foreground threshold can flip sides — and because overlapping sliding
    windows share pixels, one borderline patch flips its whole (correlated)
    window cluster at once. An unmatched detection is therefore tolerated
    only when the pre-NMS survivor sets prove a borderline mechanism — either
    the cluster's own members flipped (:func:`_analyze_extra`), or borderline
    flips elsewhere in the scene changed the clustering topology and the
    production-NMS replay reproduces both sides' outputs
    (:func:`_analyze_scene`); the evidence is recorded per flip, including a
    local counterfactual tying the scene flips to the specific extra
    (:func:`_counterfactual_extra`). Without raw survivor data the fallback
    is the strict single-flip criterion: cluster weight exactly
    ``min_neighbors + 1``. Matched-box drift past float rounding, or an extra
    cluster neither analysis can explain, is a mismatch.

    The NMS knobs must be the ones recorded in the bundle metadata (the
    pipeline that actually produced the reported detections), not the live
    config.
    """
    import numpy as np

    nms = {
        "nms_mode": nms_mode,
        "nms_min_neighbors": nms_min_neighbors,
        "nms_eps": nms_eps,
        "vertically_enlarge": vertically_enlarge,
        "nms_on_device": nms_on_device,
    }
    borderline_weight = nms_min_neighbors + 1
    mismatch_scenes = []
    tolerated_flips = []
    max_box_delta = 0.0
    max_conf_delta = 0.0
    for i, (a, b) in enumerate(zip(tpu, cpu)):
        # greedy matching of the common subset: the two backends may emit
        # the same detection set in a different NMS order (ADVICE r3), and
        # one side may carry borderline extras
        if len(a["boxes"]) >= len(b["boxes"]):
            short, long_, long_side = b, a, "tpu"
        else:
            short, long_, long_side = a, b, "cpu"
        sb = np.asarray(short["boxes"], float).reshape(-1, 4)
        lb = np.asarray(long_["boxes"], float).reshape(-1, 4)
        sc = np.asarray(short["confidences"], float)
        lc = np.asarray(long_["confidences"], float)
        unused = list(range(len(lb)))
        bd = 0.0
        cd = 0.0
        for j in range(len(sb)):
            dists = [np.abs(sb[j] - lb[k]).max() for k in unused]
            pick = int(np.argmin(dists))
            k = unused.pop(pick)
            bd = max(bd, float(dists[pick]))
            cd = max(cd, float(abs(sc[j] - lc[k])))
        max_box_delta = max(max_box_delta, bd)
        max_conf_delta = max(max_conf_delta, cd)
        hard_extras = []
        has_raw = "raw_ids" in long_ and "raw_ids" in short
        scene_evidence = None  # computed at most once per scene
        for k in unused:
            extra = {
                "scene": i,
                "side": long_side,
                "box": [float(v) for v in lb[k]],
                "confidence": float(lc[k]),
            }
            if has_raw and threshold is not None:
                extra["evidence"] = _analyze_extra(
                    extra, long_, short, nms_min_neighbors, threshold, conf_eps,
                    nms_eps=nms_eps,
                )
                ok_extra = extra["evidence"]["borderline"]
                if not ok_extra:
                    # the cluster's own members don't explain it — check for
                    # a borderline-driven clustering-topology change anywhere
                    # in the scene (see _analyze_scene)
                    if scene_evidence is None:
                        scene_evidence = _analyze_scene(
                            a, b, threshold, conf_eps, nms,
                            scene_idx=i, stage_probes=stage_probes,
                            thresholds=stage_thresholds,
                        )
                    extra["evidence"] = dict(
                        scene_evidence,
                        counterfactual=_counterfactual_extra(
                            extra,
                            long_,
                            short,
                            scene_evidence["scene_flips"],
                            nms,
                        ),
                    )
                    ok_extra = scene_evidence["borderline"]
            else:
                ok_extra = lc[k] <= borderline_weight
            if ok_extra:
                tolerated_flips.append(extra)
            else:
                hard_extras.append(extra)
        if bd > 1.0 or cd > 0.05 or hard_extras:
            mismatch_scenes.append(
                {
                    "scene": i,
                    "tpu_n": len(a["boxes"]),
                    "cpu_n": len(b["boxes"]),
                    "box_delta": bd,
                    "conf_delta": cd,
                    "hard_extras": hard_extras,
                }
            )
    return {
        "nms_min_neighbors": nms_min_neighbors,
        "borderline_flip_weight": borderline_weight,
        "max_box_delta": max_box_delta,
        "max_conf_delta": max_conf_delta,
        "tolerated_flips": tolerated_flips,
        "mismatch_scenes": mismatch_scenes,
        "ok": not mismatch_scenes,
    }


def _cache_key() -> str:
    """Measure-phase cache key: flagship weight bytes + every knob the
    exported program or the scene set depends on. A weights retrain or a
    config change produces a new key; everything else reuses the cached
    bundle + raw detections (VERDICT r4 #8: regeneration must be cheap
    enough that a stale artifact can't survive a round)."""
    import train_flagship

    h = hashlib.sha256()
    h.update(str(MEASURE_VERSION).encode())
    for name in sorted(os.listdir(train_flagship.ARTIFACT_DIR)):
        if name.startswith("model_flagship_") and name.endswith(".npz"):
            with open(os.path.join(train_flagship.ARTIFACT_DIR, name), "rb") as f:
                h.update(name.encode())
                h.update(f.read())
    from rapidobjectdetectionusingcascadedcnns_tpu import config as cf

    knobs = {
        "img": [IMG_H, IMG_W],
        "n_scenes": N_SCENES,
        "batch": BATCH,
        "caps": CAPS,
        "threshold": cf.get("foreground_confidence_threshold"),
        "mwl": cf.get("min_window_length"),
        "wsf": cf.get("window_scale_factor"),
        "nms": cf.get("nms"),
        "nms_on_device": cf.get("nms_on_device"),
        "nms_mn": cf.get("nms_opencv_min_neighbors"),
        "venl": cf.get("vertically_enlarge_bboxes"),
        "conf_mode": cf.get("final_confidence_calculation"),
        "chunk": cf.get("inference_chunk_size"),
        "hp": cf.get("inference_high_precision"),
    }
    h.update(json.dumps(knobs, sort_keys=True).encode())
    return h.hexdigest()[:16]


def _measure(cache_dir: str) -> None:
    """Expensive phase: export the cross-platform bundle, run it on the TPU
    (parent) and on CPU (sanitized child), cache bundle + raw detections."""
    import jax
    import numpy as np

    from rapidobjectdetectionusingcascadedcnns_tpu import serve

    import train_flagship

    model = train_flagship.load_flagship()
    assert model is not None, (
        "trained flagship artifact missing (machine-local, gitignored) — "
        "run `python tools/train_flagship.py` first, or use bench.py which "
        "auto-retrains"
    )

    assert jax.devices()[0].platform == "tpu", (
        "run the parent under the tunneled-TPU backend (got {})".format(
            jax.devices()[0].platform
        )
    )

    bundle_dir = os.path.join(cache_dir, "bundle")
    timings = {}
    if not os.path.exists(os.path.join(bundle_dir, "meta.json")):
        t0 = time.perf_counter()
        bundle = serve.export_detector(
            model,
            IMG_H,
            IMG_W,
            batch=BATCH,
            capacities=CAPS,
            n_rungs=2,
            resample_impl="xla",
            platforms=("tpu", "cpu"),
        )
        timings["export_s"] = time.perf_counter() - t0
        tmp = bundle_dir + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        serve.save_bundle(bundle, tmp)
        os.replace(tmp, bundle_dir)

    det = serve.load_bundle(bundle_dir)
    t0 = time.perf_counter()
    tpu_results = det.detect_batch(_scenes())
    timings["tpu_detect_s"] = time.perf_counter() - t0
    with open(os.path.join(cache_dir, "tpu.json"), "w") as f:
        json.dump(
            {
                "platform": jax.devices()[0].platform,
                "detect_s": timings["tpu_detect_s"],
                "detections": _detections_to_jsonable(tpu_results),
            },
            f,
        )

    # child: CPU backend, tunneled-TPU site hook dropped (the same
    # sanitization the CPU test suite uses, tests/conftest.py)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    env.pop("XLA_FLAGS", None)
    t0 = time.perf_counter()
    subprocess.run(
        [
            sys.executable,
            os.path.abspath(__file__),
            "--child",
            bundle_dir,
            os.path.join(cache_dir, "cpu.json"),
        ],
        env=env,
        check=True,
        timeout=1800,
    )
    timings["cpu_child_wall_s"] = time.perf_counter() - t0
    with open(os.path.join(cache_dir, "timings.json"), "w") as f:
        json.dump(timings, f)


def main(recompare: bool = False) -> int:
    import jax

    cache_dir_jit = os.environ.get("RODC_JIT_CACHE", "/tmp/rodc_jit_cache")
    os.makedirs(cache_dir_jit, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir_jit)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rapidobjectdetectionusingcascadedcnns_tpu import config as cf

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import train_flagship

    cf.reset()
    quality = train_flagship.load_flagship_quality()
    assert quality is not None, "flagship_eval.json missing"
    cf.set("foreground_confidence_threshold", float(quality["threshold"]))
    if quality.get("min_neighbors") is not None:
        # shipped operating point carries both knobs (round 5: mn=0)
        cf.set("nms_opencv_min_neighbors", int(quality["min_neighbors"]))
    cf.set("nms_on_device", True)

    cache_dir = os.path.join(CACHE_ROOT, _cache_key())
    os.makedirs(cache_dir, exist_ok=True)
    measured = all(
        os.path.exists(os.path.join(cache_dir, f))
        for f in ("tpu.json", "cpu.json", "timings.json", "bundle/meta.json")
    )
    if not measured:
        if recompare:
            print("no cached measurement for the current weights/config key")
            return 2
        _measure(cache_dir)

    with open(os.path.join(cache_dir, "tpu.json")) as f:
        tpu_run = json.load(f)
    with open(os.path.join(cache_dir, "cpu.json")) as f:
        cpu_run = json.load(f)
    with open(os.path.join(cache_dir, "timings.json")) as f:
        timings = json.load(f)
    with open(os.path.join(cache_dir, "bundle", "meta.json")) as f:
        meta = json.load(f)

    assert tpu_run["platform"] == "tpu", tpu_run["platform"]
    assert cpu_run["platform"] == "cpu", cpu_run["platform"]
    tpu, cpu = tpu_run["detections"], cpu_run["detections"]

    # every knob the replay/compare depends on comes from the BUNDLE META —
    # the pipeline that actually produced the reported detections (ADVICE r4)
    def run_compare(probes):
        return compare_detections(
            tpu,
            cpu,
            nms_min_neighbors=int(meta["nms_min_neighbors"]),
            threshold=float(meta["thresholds"][-1]),
            nms_mode=str(meta["nms_mode"]),
            vertically_enlarge=bool(meta["vertically_enlarge"]),
            nms_on_device=bool(meta["nms_on_device"]),
            stage_probes=probes,
            stage_thresholds=[float(t) for t in meta["thresholds"]],
            nms_eps=float(meta.get("nms_eps", 0.2)),
        )

    probe_path = os.path.join(cache_dir, "stage_probes.json")
    probes = None
    if os.path.exists(probe_path):
        with open(probe_path) as f:
            probes = json.load(f)
    cmp = run_compare(probes)

    # pass 2: survivor flips whose FINAL confidence is not near-threshold
    # need the per-stage margin probe on both platforms (the flip may have
    # happened at an earlier stage gate); probe exactly those windows,
    # cache, and re-compare
    want = {}
    for ms in cmp["mismatch_scenes"]:
        for extra in ms["hard_extras"]:
            ev = extra.get("evidence") or {}
            for f in ev.get("scene_flips", []):
                if f["conf"] > float(meta["thresholds"][-1]) + 0.05:
                    want.setdefault(str(extra["scene"]), set()).add(
                        int(f["window_id"])
                    )
    have = set()
    if probes:
        have = set(probes.get("tpu", {})) & set(probes.get("cpu", {}))
    missing = {
        s: sorted(w for w in ws if "{}:{}".format(s, w) not in have)
        for s, ws in want.items()
    }
    missing = {s: ws for s, ws in missing.items() if ws}
    if missing and not recompare:
        import jax

        assert jax.devices()[0].platform == "tpu"
        tpu_probes = _probe_windows(
            {int(s): ws for s, ws in missing.items()}, meta
        )
        req_path = os.path.join(cache_dir, "probe_request.json")
        with open(req_path, "w") as f:
            json.dump({"meta": meta, "requests": missing}, f)
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = REPO
        env.pop("XLA_FLAGS", None)
        cpu_out = os.path.join(cache_dir, "probe_cpu.json")
        subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--probe-child",
                req_path,
                cpu_out,
            ],
            env=env,
            check=True,
            timeout=1800,
        )
        with open(cpu_out) as f:
            cpu_probe_run = json.load(f)
        assert cpu_probe_run["platform"] == "cpu"
        probes = probes or {"tpu": {}, "cpu": {}}
        probes.setdefault("tpu", {}).update(tpu_probes)
        probes.setdefault("cpu", {}).update(cpu_probe_run["probes"])
        with open(probe_path, "w") as f:
            json.dump(probes, f, indent=1)
        cmp = run_compare(probes)

    bundle_dir = os.path.join(cache_dir, "bundle")
    bundle_bytes = sum(
        os.path.getsize(os.path.join(bundle_dir, f))
        for f in os.listdir(bundle_dir)
    )
    record = {
        "platforms": ["tpu", "cpu"],
        "img_hw": [IMG_H, IMG_W],
        "n_scenes": N_SCENES,
        "bundle_bytes": bundle_bytes,
        "export_s": round(timings.get("export_s", 0.0), 2),
        "tpu_detect_s": round(timings["tpu_detect_s"], 2),
        "cpu_detect_s": round(cpu_run["detect_s"], 2),
        "cpu_child_wall_s": round(timings["cpu_child_wall_s"], 2),
        "measure_cache_key": os.path.basename(cache_dir),
        "n_detections_per_scene_tpu": [len(r["boxes"]) for r in tpu],
        "n_detections_per_scene_cpu": [len(r["boxes"]) for r in cpu],
        **cmp,
    }
    out = os.path.join(REPO, "artifacts", "cross_platform_check.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))
    return 0 if record["ok"] else 1


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _child(sys.argv[2], sys.argv[3])
    elif len(sys.argv) > 1 and sys.argv[1] == "--probe-child":
        _probe_child(sys.argv[2], sys.argv[3])
    else:
        sys.exit(main(recompare="--recompare" in sys.argv[1:]))
