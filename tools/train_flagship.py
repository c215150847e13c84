"""Train + cache the flagship benchmark cascade (reference default
architecture: conv [32], fc1 512, 12/24/48, bottleneck chaining, boosted
soft-F-beta stages) on the synthetic corpus, then measure its detection
quality and survivor distribution on the benchmark scenes.

The artifact is saved under artifacts/flagship/ (not committed: the stage-2
fc1 alone is ~151 MB of f32 weights — regenerate with this script, ~3-5 min
on the attached TPU). bench.py loads it when present so the recorded
benchmark runs a *trained* cascade with realistic survivor distributions and
reports a quality number next to the throughput number.

Usage: python tools/train_flagship.py [--force]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ARTIFACT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts"
)
SESSION_KEY = "flagship"


def flagship_config(cf):
    """Benchmark configuration: reference default architecture + the training
    recipe that makes synthetic cascades detect (NOTES.md round-1 findings:
    low max_beta so stage 0 discriminates; positional augmentation so nets
    fire on neighboring pyramid windows and NMS clusters form)."""
    cf.set("conv_filter_sizes", [32])
    cf.set("fc1_size", 512)
    cf.set("cascade_n_nets", 3)
    cf.set("img_width", 48)
    cf.set("max_beta", 2)
    cf.set("min_beta", 1)
    cf.set("epochs_total", 16)
    cf.set("batch_size", 512)
    cf.set("n_max_constant_evals", None)
    cf.set("data_augmentation_online", True)
    cf.set("dao_crop_probability", 1.0)
    cf.set("dao_crop_min_percent", 0.6)
    cf.set("dao_max_rotation_angle", 10.0)
    cf.set("dao_max_foreground_rotation_angle", 10.0)


def apply_recorded_overrides(cf):
    """Apply the promoted sweep winner's recorded recipe
    (artifacts/flagship_overrides.json, written by tools/sweep_flagship.py
    on promotion) so regenerating via this script rebuilds the SAME
    architecture/recipe the recorded eval numbers describe — not the base
    recipe. Returns a recipe dict: hard-negative replication count plus any
    recorded corpus/epoch/seed parameters (underscore keys)."""
    recipe = {"hard_negatives": 0, "hard_positives": 0}
    path = os.path.join(ARTIFACT_DIR, "flagship_overrides.json")
    if os.path.exists(path):
        with open(path) as f:
            overrides = json.load(f)
        for k, v in overrides.items():
            if k == "_hard_negatives":
                recipe["hard_negatives"] = int(v)
            elif k == "_hard_positives":
                recipe["hard_positives"] = int(v)
            elif k in ("_n_pos", "_n_neg", "_seed"):
                recipe[k[1:]] = int(v)
            elif k == "_epochs":
                cf.set("epochs_total", int(v))
            elif not k.startswith("_"):
                cf.set(k, v)
        print(f"applied recorded flagship overrides: {overrides}")
    return recipe


def train_flagship(n_pos=3000, n_neg=24000, seed=0):
    """Round-2 measured recipe sweep (synthetic corpus, 20 eval scenes):

        n_pos/n_neg epochs  recall  FP/scene  stage-0 survivors mean/max
        2000/6000   12      0.883   0.1       1544 / 2590   (30%)
        2000/12000  16      0.883   0.1        919 / 1646   (18%)
        3000/24000  16      0.933   0.2        276 /  581   (5.5%)  <- this
        4000/36000  16      0.900   0.2        255 /  483   (recall regressed)

    Background-heavy corpora sharpen stage 0 exactly as the reference's
    design intends (README.md:69): survivor capacities drop ~4x, which is
    the dominant VGA-throughput lever."""
    from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
    from rapidobjectdetectionusingcascadedcnns_tpu.train import cascade_trainer as ct
    from rapidobjectdetectionusingcascadedcnns_tpu.train import checkpoint

    flagship_config(cf)
    recipe = apply_recorded_overrides(cf)
    n_pos = recipe.get("n_pos", n_pos)
    n_neg = recipe.get("n_neg", n_neg)
    seed = recipe.get("seed", seed)
    hn_rep = recipe["hard_negatives"]
    hard = None
    if hn_rep:
        hn_path = os.path.join(ARTIFACT_DIR, "hard_negatives.npz")
        if os.path.exists(hn_path):
            with np.load(hn_path) as z:
                hard = np.repeat(z["images"], hn_rep, axis=0)
            print(f"{len(hard)} hard-negative samples (x{hn_rep} replication)")
        else:
            print("WARNING: recorded recipe wants hard negatives but "
                  "artifacts/hard_negatives.npz is absent "
                  "(tools/mine_hard_negatives.py) — training without them")
    hp_rep = recipe["hard_positives"]
    hard_pos = None
    if hp_rep:
        hp_path = os.path.join(ARTIFACT_DIR, "hard_positives.npz")
        if os.path.exists(hp_path):
            with np.load(hp_path) as z:
                hard_pos = np.repeat(z["images"], hp_rep, axis=0)
            print(f"{len(hard_pos)} hard-positive samples (x{hp_rep} replication)")
        else:
            print("WARNING: recorded recipe wants hard positives but "
                  "artifacts/hard_positives.npz is absent "
                  "(tools/mine_hard_positives.py) — training without them")
    from rapidobjectdetectionusingcascadedcnns_tpu.models.cnn import (
        stage_input_sizes,
    )

    sizes = stage_input_sizes(cf.get("cascade_n_nets"), cf.get("img_width"), True)
    # "mixed" corpus: procedural patches + patches sampled from full scenes
    # via the offline-sampling flow — the scene-sampled negatives are what
    # teach stage 0 to reject actual pyramid windows (measured: stage-0
    # survivor rate 35% -> ~5% vs the patches-only corpus)
    provider = ct.SyntheticProvider(
        n_pos, n_neg, sizes, seed=seed, source="mixed", hard_negatives=hard,
        hard_positives=hard_pos,
    )
    trainer = ct.CascadeTrainer(provider, seed=seed)
    t0 = time.time()
    model = trainer.train()
    train_secs = time.time() - t0
    paths = checkpoint.save_cascade(ARTIFACT_DIR, SESSION_KEY, model)
    print(f"trained in {train_secs:.0f}s; saved {len(paths)} stages to {ARTIFACT_DIR}")
    return model, trainer, train_secs


def load_flagship():
    """Load the cached artifact, or None when absent/incompatible."""
    from rapidobjectdetectionusingcascadedcnns_tpu.train import checkpoint

    try:
        return checkpoint.load_cascade(ARTIFACT_DIR, SESSION_KEY)
    except (FileNotFoundError, KeyError, ValueError):
        return None


def load_flagship_quality():
    """The promoted eval artifact (operating threshold, measured survivor
    maxima, quality numbers), or None when absent."""
    import json

    path = os.path.join(ARTIFACT_DIR, "flagship_eval.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def capacity_schedule_from_quality(quality):
    """The deployment capacity policy: size each survivor buffer from the
    trained model's MEASURED per-stage survivor maxima with 1.5x headroom,
    rounded up to the 128 lane width — saturation re-dispatch remains the
    correctness net if a frame exceeds them. One definition; bench.py and
    every profiling/serving tool must use this."""
    return [
        ((int(m * 1.5) + 127) // 128) * 128 for m in quality["survivors_max"][:-1]
    ]


_SCENE_CACHE = {}


def benchmark_scenes(n_scenes=100, seed0=100):
    """Deterministic eval scenes, cached (scene synthesis is host-bound on
    this 1-core VM, and sweeps evaluate many candidates on the same set)."""
    from rapidobjectdetectionusingcascadedcnns_tpu.data import synthetic

    key = (n_scenes, seed0)
    if key not in _SCENE_CACHE:
        _SCENE_CACHE[key] = [
            synthetic.make_scene(
                480, 640, n_faces=3, seed=seed0 + s, min_face=48, max_face=120
            )
            for s in range(n_scenes)
        ]
    return _SCENE_CACHE[key]


def _miss_stage_probe(detector, image, gt, grid_boxes, plan, boxes_float,
                      thr, iou_floor=0.3):
    """Counterfactual per-stage foreground probabilities for the pyramid
    windows overlapping one missed ground-truth face (VERDICT r4 #3: locate
    WHERE in the cascade a missed face dies).

    Stage 0 runs the production extraction path over the full plan (then
    selects the overlapping rows); stages 1/2 run the production
    re-extraction (`_apply_stage_on_boxes_chunked`) on the selected boxes
    with real bottleneck chaining — every window is scored at every stage
    regardless of whether the earlier gate would have killed it, so the
    record distinguishes "stage 0 never fires" from "survives stage 0,
    dies later" from "survives all gates, lost to NMS clustering"."""
    import jax.numpy as jnp

    from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
    from rapidobjectdetectionusingcascadedcnns_tpu.models import cascade as casc
    from rapidobjectdetectionusingcascadedcnns_tpu.ops import rectangles as rect_ops

    model = detector.model
    win_iou = rect_ops.iou_matrix(grid_boxes, np.asarray(gt, np.float64)[None])[:, 0]
    sel = np.nonzero(win_iou >= iou_floor)[0]
    out = {"n_windows_iou30": int(len(sel))}
    if not len(sel):
        out["stage_of_death"] = "no_overlapping_window"
        return out

    image_f = jnp.asarray(image, jnp.float32)
    chunk = int(cf.get("inference_chunk_size"))
    emode = casc.resolve_extraction_mode(plan)
    impl = casc.resolve_resample_impl()
    params = detector._params_device
    stats = detector._stats_device
    cfgs = model.stage_configs

    probs0, bneck0, ids0, valid0 = casc._stage0_apply(
        image_f, jnp.asarray(boxes_float, jnp.float32), plan,
        params[0], cfgs[0], stats[0][0], stats[0][1], chunk, emode, impl,
        False,
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
    p0_sel = p0[sel]
    sel_boxes = jnp.asarray(np.asarray(boxes_float)[sel], jnp.float32)

    bneck = jnp.asarray(b0[sel])
    stage_probs = [p0_sel]
    for s in range(1, model.n_nets):
        probs_s, bneck = casc._apply_stage_on_boxes_chunked(
            image_f, sel_boxes, bneck, params[s], cfgs[s],
            stats[s][0], stats[s][1], chunk, False, impl,
        )
        stage_probs.append(np.asarray(probs_s)[:, 1])

    alive = np.ones(len(sel), bool)
    stage_of_death = None
    for s, ps in enumerate(stage_probs):
        out[f"p{s}_max_all"] = round(float(np.nanmax(ps)), 3)
        gated = np.where(alive, ps, -np.inf)
        out[f"p{s}_max_surviving"] = (
            round(float(gated.max()), 3) if np.isfinite(gated.max()) else None
        )
        alive = alive & (ps > thr)
        out[f"n_alive_after_stage{s}"] = int(alive.sum())
        if stage_of_death is None and not alive.any():
            stage_of_death = s
    if stage_of_death is None:
        # windows passed every gate but no detection matched: the cluster
        # fell to NMS (min_neighbors / averaging / containment)
        stage_of_death = "nms"
    out["stage_of_death"] = stage_of_death
    out["best_window_iou"] = round(float(win_iou[sel].max()), 3)
    return out


def evaluate_on_scenes(model, n_scenes=100, seed0=100, threshold=0.5,
                       miss_analysis=True, min_neighbors=1):
    """Scene-level recall / false positives + survivor stats at the
    benchmark inference config (default 100 scenes / 300 faces — verdict r2
    items 4+9: the quality line must not be a 20-scene sample).

    ``miss_analysis``: per missed face, record the best IoU a detection
    achieved AND the geometric ceiling — the best IoU ANY window of the
    pyramid grid could achieve — separating model-limited misses from
    window-grid-limited ones."""
    from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
    from rapidobjectdetectionusingcascadedcnns_tpu.models import cascade as casc
    from rapidobjectdetectionusingcascadedcnns_tpu.ops import rectangles as rect_ops
    from rapidobjectdetectionusingcascadedcnns_tpu.ops.pyramid import (
        build_plan,
        window_table,
    )

    cf.set("window_scale_factor", 1.1)
    cf.set("min_window_length", 0.075)
    cf.set("foreground_confidence_threshold", threshold)
    cf.set("nms", cf.NMS_OPENCV)
    cf.set("nms_opencv_min_neighbors", min_neighbors)

    detector = casc.CascadeDetector(model)
    scenes = benchmark_scenes(n_scenes, seed0)
    results = detector.detect_batch([s.image for s in scenes])

    grid_boxes = None
    if miss_analysis:
        plan = build_plan(480, 640, model.input_sizes[0], model.input_sizes[0],
                          cf.get("min_window_length"), cf.get("window_scale_factor"))
        table = window_table(plan)
        grid_boxes = table["coords_norm"].astype(np.float64)
        boxes_float = table["boxes_float"]

    tp = fn = fp = 0
    survivors = []
    misses = []
    for si, (scene, res) in enumerate(zip(scenes, results)):
        survivors.append(res.n_survivors_per_stage)
        matched = set()
        for gt in scene.boxes:
            hit = False
            for k, box in enumerate(res.boxes):
                if rect_ops.iou_single(gt, box) > 0.3:
                    hit = True
                    matched.add(k)
            tp += int(hit)
            fn += int(not hit)
            if not hit and miss_analysis:
                best_det = max(
                    (rect_ops.iou_single(gt, b) for b in res.boxes), default=0.0
                )
                best_raw = max(
                    (rect_ops.iou_single(gt, b) for b in res.raw_boxes),
                    default=0.0,
                )
                ceiling = float(
                    rect_ops.iou_matrix(
                        np.asarray(gt, np.float64)[None], grid_boxes
                    ).max()
                )
                miss = {
                    "scene": si,
                    "gt": [float(v) for v in gt],
                    "best_detection_iou": round(float(best_det), 3),
                    "best_raw_window_iou": round(float(best_raw), 3),
                    "grid_ceiling_iou": round(ceiling, 3),
                }
                # per-stage counterfactual probe: WHERE does this face die?
                miss["stage_analysis"] = _miss_stage_probe(
                    detector, scene.image, gt, grid_boxes, plan,
                    boxes_float, threshold,
                )
                misses.append(miss)
        fp += len(res.boxes) - len(matched)

    survivors = np.asarray(survivors)
    stats = {
        "n_scenes": n_scenes,
        "n_faces": int(tp + fn),
        "threshold": threshold,
        "min_neighbors": min_neighbors,
        "recall": round(tp / max(tp + fn, 1), 3),
        "false_pos_per_scene": round(fp / n_scenes, 2),
        "n_windows": int(results[0].n_windows),
        "survivors_mean": [round(float(x), 1) for x in survivors.mean(axis=0)],
        "survivors_max": [int(x) for x in survivors.max(axis=0)],
    }
    if miss_analysis:
        stats["misses"] = misses
        stats["misses_grid_limited"] = sum(
            1 for m in misses if m["grid_ceiling_iou"] <= 0.3
        )
        stats["misses_stage0_blind"] = sum(
            1
            for m in misses
            if m.get("stage_analysis", {}).get("stage_of_death") == 0
        )
    return stats


def main():
    import jax

    cache_dir = os.environ.get("RODC_JIT_CACHE", "/tmp/rodc_jit_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rapidobjectdetectionusingcascadedcnns_tpu import config as cf

    force = "--force" in sys.argv
    model = None if force else load_flagship()
    if model is None:
        model, _trainer, _secs = train_flagship()
    else:
        flagship_config(cf)
        print("loaded cached flagship artifact")

    # shipped operating point: recall-first subject to the FP budget
    # (<= 0.2 FP/scene), swept over BOTH inference knobs — the per-stage
    # confidence threshold AND the groupRectangles min-neighbors bar.
    # Round 5's stage-of-death probes showed 9/10 misses at (0.3, mn=1)
    # were full-cascade survivors killed only by the >=2-member cluster
    # requirement; mn=0 (keep singleton clusters, OpenCV count > 0
    # semantics) recovers them for +0.06 FP/scene. The sweep runs without
    # miss analysis (cheap); the winner is re-evaluated WITH the per-miss
    # stage-of-death probes so the shipped artifact explains its own
    # residual misses.
    FP_BUDGET = 0.2
    best_cfg = None
    best_key = None
    for mn in (1, 0):
        for thr in (0.5, 0.4, 0.3):
            stats = evaluate_on_scenes(
                model, threshold=thr, min_neighbors=mn, miss_analysis=False
            )
            print("thr {} mn {}: recall {} @ {} FP/scene".format(
                thr, mn, stats["recall"], stats["false_pos_per_scene"]))
            key = (stats["recall"], -stats["false_pos_per_scene"])
            if stats["false_pos_per_scene"] <= FP_BUDGET and (
                best_key is None or key > best_key
            ):
                best_key = key
                best_cfg = (thr, mn)
    thr, mn = best_cfg if best_cfg is not None else (0.5, 1)
    stats = evaluate_on_scenes(model, threshold=thr, min_neighbors=mn)
    stats["operating_point_policy"] = (
        "max recall s.t. false_pos_per_scene <= {} over thresholds "
        "(0.5, 0.4, 0.3) x min_neighbors (1, 0)".format(FP_BUDGET)
    )
    print(json.dumps({k: v for k, v in stats.items() if k != "misses"}, indent=2))
    with open(os.path.join(ARTIFACT_DIR, "flagship_eval.json"), "w") as f:
        json.dump(stats, f, indent=2)


if __name__ == "__main__":
    main()
