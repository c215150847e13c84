"""Sweep flagship training recipes and keep the best artifact.

Trains several candidate cascades (seed / corpus-size / epoch variants) on
the synthetic corpus, evaluates each with the benchmark-scene harness
(train_flagship.evaluate_on_scenes), and keeps the winner — ranked by
recall, then fewer false positives, then smaller stage-0 survivor max (the
VGA-throughput lever). Affordable since the augmented train step runs at
~100K samples/s (tools/profile_train.py).

Usage: python tools/sweep_flagship.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

cache_dir = os.environ.get("RODC_JIT_CACHE", "/tmp/rodc_jit_cache")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import train_flagship as tf_mod

CANDIDATES = [
    # (name, n_pos, n_neg, epochs, seed, config_overrides)
    ("base-s0", 3000, 24000, 16, 0, {}),
    ("big-s0", 5000, 40000, 20, 0, {}),
    ("big-s1", 5000, 40000, 20, 1, {}),
    ("huge-s0", 8000, 64000, 24, 0, {}),
    # deeper stage trunks: two conv/pool blocks per net
    ("deep2-s0", 5000, 40000, 20, 0, {"conv_filter_sizes": [32, 32]}),
    # a 4th (6px) front stage: cheaper early rejection, denser grid
    ("stage4-s0", 5000, 40000, 20, 0, {"cascade_n_nets": 4}),
    # recall-heavier boosting schedule
    ("beta4-s0", 5000, 40000, 20, 0, {"max_beta": 4}),
    # hard-negative bootstrap round: deep2 retrained with the flagship's
    # own mined false positives (tools/mine_hard_negatives.py), replicated
    # Nx against the 40k base negatives. x8 measured recall 0.917 @ 0.0
    # FP/scene (over-weighted: all FP margin, recall regressed), hence the
    # lighter x2/x4 variants
    ("deep2-hnm-s0", 5000, 40000, 20, 0,
     {"conv_filter_sizes": [32, 32], "_hard_negatives": 8}),
    ("deep2-hnm4-s0", 5000, 40000, 20, 0,
     {"conv_filter_sizes": [32, 32], "_hard_negatives": 4}),
    ("deep2-hnm2-s0", 5000, 40000, 20, 0,
     {"conv_filter_sizes": [32, 32], "_hard_negatives": 2}),
    # cheaper trunks + the same mined hard negatives: the deep2 winner costs
    # ~2x device time/frame vs the single-block trunk (bench 424 -> 357 fps);
    # if a narrower trunk holds recall >= incumbent it's a strict Pareto win
    ("hnm4-s0", 5000, 40000, 20, 0, {"_hard_negatives": 4}),
    ("deep24-hnm4-s0", 5000, 40000, 20, 0,
     {"conv_filter_sizes": [24, 24], "_hard_negatives": 4}),
    # pooled trunk: pooling_stride 2 shrinks every fc1 4x (stage-0 4608 ->
    # 288) — ~0.5 ms/frame of VGA device time if recall holds
    ("deep2-pool2-hnm4-s0", 5000, 40000, 20, 0,
     {"conv_filter_sizes": [32, 32], "pooling_stride": 2,
      "_hard_negatives": 4}),
    # mixed-width trunk (conv_filter_sizes_per_stage): stage 0 runs on EVERY
    # pyramid window so it keeps the cheap single-block trunk; stages 1/2 see
    # only survivors and keep the deep2 capacity that won on recall
    ("mix32-hnm4-s0", 5000, 40000, 20, 0,
     {"conv_filter_sizes_per_stage": [[32], [32, 32], [32, 32]],
      "_hard_negatives": 4}),
]

# the quality bar is an OPERATING POINT, not a fixed threshold: the
# reference's own evaluation sweeps the detection-score cut into a curve
# (/root/reference/app/evaluate_fddb_app.py:171-179). A candidate is scored
# by its best recall among thresholds whose false-positive rate stays within
# budget; the chosen threshold ships in the artifact and bench.py runs at it.
OP_THRESHOLDS = (0.3, 0.5, 0.7, 0.9)
FP_BUDGET = 0.5  # false positives per scene (verdict r2 item 4)


def operating_sweep(evaluate, model):
    """Evaluate ``model`` at each operating threshold; returns
    (points, best_feasible) where best_feasible maximizes recall subject to
    fp <= FP_BUDGET (falls back to the lowest-fp point when nothing is
    feasible, so degenerate candidates still rank deterministically)."""
    points = []
    for t in OP_THRESHOLDS:
        stats = evaluate(model, threshold=t, miss_analysis=False)
        stats["threshold"] = t
        points.append(stats)
    feasible = [p for p in points if p["false_pos_per_scene"] <= FP_BUDGET]
    if feasible:
        best = max(feasible, key=lambda p: (p["recall"], -p["false_pos_per_scene"]))
    else:
        best = min(points, key=lambda p: p["false_pos_per_scene"])
    return points, best


def rank_key(stats):
    # feasible-point recall first; then a combined cost at that point:
    # false positives traded against stage-0 survivor sharpness
    # (survivors_max[0] sets the bench capacity schedule — ~0.2 ms/frame per
    # 300 extra survivors at VGA). Infeasible candidates (fp over budget at
    # every threshold) sort after every feasible one.
    point = stats.get("best_feasible", stats)
    infeasible = point["false_pos_per_scene"] > FP_BUDGET
    return (
        infeasible,
        -point["recall"],
        point["false_pos_per_scene"] + point["survivors_max"][0] / 2000.0,
    )


def main():
    only = set(sys.argv[1:])  # optional candidate-name filter
    from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
    from rapidobjectdetectionusingcascadedcnns_tpu.train import cascade_trainer as ct
    from rapidobjectdetectionusingcascadedcnns_tpu.train import checkpoint
    from rapidobjectdetectionusingcascadedcnns_tpu.utils import log

    log.set_echo(True)
    results = []
    best = None
    for name, n_pos, n_neg, epochs, seed, overrides in CANDIDATES:
        if only and name not in only:
            continue
        cf.reset()
        tf_mod.flagship_config(cf)
        cf.set("epochs_total", epochs)
        hn_rep = 0
        for k, v in overrides.items():
            if k == "_hard_negatives":
                hn_rep = int(v)
                continue
            cf.set(k, v)
        from rapidobjectdetectionusingcascadedcnns_tpu.models.cnn import (
            stage_input_sizes,
        )

        sizes = stage_input_sizes(
            cf.get("cascade_n_nets"), cf.get("img_width"), True
        )
        hard = None
        if hn_rep:
            import numpy as _np

            with _np.load(
                os.path.join(tf_mod.ARTIFACT_DIR, "hard_negatives.npz")
            ) as z:
                hard = _np.repeat(z["images"], hn_rep, axis=0)
            print(f"{name}: {len(hard)} hard-negative samples "
                  f"(x{hn_rep} replication)", flush=True)
        provider = ct.SyntheticProvider(
            n_pos, n_neg, sizes, seed=seed, source="mixed", hard_negatives=hard
        )
        trainer = ct.CascadeTrainer(provider, seed=seed)
        t0 = time.time()
        try:
            model = trainer.train()
        except Exception as exc:  # a degenerate recipe must not kill the sweep
            print(f"{name}: FAILED ({exc})", flush=True)
            results.append({"candidate": name, "error": str(exc)})
            continue
        train_secs = time.time() - t0
        points, chosen = operating_sweep(tf_mod.evaluate_on_scenes, model)
        # headline the CHOSEN operating point; keep every point on record
        stats = dict(chosen)
        stats["operating_points"] = [
            {k: v for k, v in p.items() if k != "misses"} for p in points
        ]
        stats["fp_budget"] = FP_BUDGET
        summary = {
            k: v for k, v in stats.items()
            if k not in ("misses", "operating_points")
        }
        stats["candidate"] = name
        summary["candidate"] = name
        stats["train_secs"] = summary["train_secs"] = round(train_secs, 1)
        stats["overrides"] = summary["overrides"] = overrides
        print(f"{name}: {json.dumps(summary)}", flush=True)
        results.append(stats)
        if best is None or rank_key(stats) < rank_key(best[1]):
            # record the FULL recipe (config overrides + corpus/epochs/seed)
            # so tools/train_flagship.py can rebuild this exact winner
            best = (model, stats, dict(
                overrides, _n_pos=n_pos, _n_neg=n_neg, _epochs=epochs,
                _seed=seed,
            ))

    # merge this run's candidates into the recorded sweep (partial reruns
    # with a name filter must extend the record, not erase it)
    sweep_path = os.path.join(tf_mod.ARTIFACT_DIR, "flagship_sweep.json")
    prior = {"candidates": [], "winner": None}
    if os.path.exists(sweep_path):
        with open(sweep_path) as f:
            prior = json.load(f)
    merged = [
        c for c in prior["candidates"]
        if c.get("candidate") not in {r.get("candidate") for r in results}
    ] + results

    if best is None:
        # every candidate failed, or the name filter matched nothing —
        # still persist whatever was recorded before bailing
        with open(sweep_path, "w") as f:
            json.dump(
                {"candidates": merged, "winner": prior.get("winner")}, f, indent=1
            )
        raise SystemExit(
            "no candidate completed (filter={}); sweep record updated, "
            "incumbent untouched".format(sorted(only) or "none")
        )
    model, stats, win_overrides = best

    # promote only if the run's best beats the incumbent flagship artifact —
    # compared at each side's best FEASIBLE operating point. The incumbent's
    # eval json may predate operating-point headlining (a fixed-0.5 record);
    # in that case rebuild its feasible point from the recorded
    # threshold x min_neighbors grid (tools/operating_points.py) when one
    # exists, else fall back to its headline numbers.
    eval_path = os.path.join(tf_mod.ARTIFACT_DIR, "flagship_eval.json")
    incumbent = None
    if os.path.exists(eval_path):
        with open(eval_path) as f:
            incumbent = json.load(f)
    if incumbent is not None and "operating_points" not in incumbent:
        grid_path = os.path.join(
            tf_mod.ARTIFACT_DIR, "flagship_operating_points.json"
        )
        if os.path.exists(grid_path):
            with open(grid_path) as f:
                grid = [
                    p for p in json.load(f)["points"]
                    if p.get("min_neighbors", 1) == 1
                ]
            feas = [p for p in grid if p["false_pos_per_scene"] <= FP_BUDGET]
            if feas:
                incumbent = max(
                    feas,
                    key=lambda p: (p["recall"], -p["false_pos_per_scene"]),
                )
    if incumbent is not None and rank_key(incumbent) <= rank_key(stats):
        print(f"incumbent flagship stays (recall={incumbent['recall']} "
              f"fp={incumbent['false_pos_per_scene']} @thr "
              f"{incumbent.get('threshold')} vs challenger "
              f"{stats['recall']}/{stats['false_pos_per_scene']} @thr "
              f"{stats.get('threshold')})")
        with open(sweep_path, "w") as f:
            json.dump(
                {"candidates": merged, "winner": prior.get("winner")},
                f, indent=1,
            )
        return

    checkpoint.save_cascade(tf_mod.ARTIFACT_DIR, tf_mod.SESSION_KEY, model)
    # re-evaluate the winner at its shipped threshold WITH the per-miss
    # geometric analysis for the headline artifact
    headline = tf_mod.evaluate_on_scenes(
        model, threshold=stats["threshold"], miss_analysis=True
    )
    headline["threshold"] = stats["threshold"]
    headline["fp_budget"] = FP_BUDGET
    headline["operating_points"] = stats["operating_points"]
    headline["train_secs"] = stats["train_secs"]
    headline["overrides"] = stats["overrides"]
    with open(eval_path, "w") as f:
        json.dump(headline, f, indent=1)
    with open(sweep_path, "w") as f:
        json.dump({"candidates": merged, "winner": stats["candidate"]}, f, indent=1)
    with open(os.path.join(tf_mod.ARTIFACT_DIR, "flagship_overrides.json"), "w") as f:
        json.dump(win_overrides, f, indent=1)
    print(f"winner: {stats['candidate']} recall={stats['recall']} "
          f"fp/scene={stats['false_pos_per_scene']} "
          f"survivors_max={stats['survivors_max']} "
          f"grid_limited_misses={stats.get('misses_grid_limited')}")


if __name__ == "__main__":
    main()
