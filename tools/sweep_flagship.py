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
    # 8x so ~4k effective hard samples weigh against the 40k base negatives
    ("deep2-hnm-s0", 5000, 40000, 20, 0,
     {"conv_filter_sizes": [32, 32], "_hard_negatives": 8}),
]


def rank_key(stats):
    # recall first; then a combined cost: false positives traded against
    # stage-0 survivor sharpness (survivors_max[0] sets the bench capacity
    # schedule — ~0.2 ms/frame per 300 extra survivors at VGA)
    return (
        -stats["recall"],
        stats["false_pos_per_scene"] + stats["survivors_max"][0] / 2000.0,
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
        stats = tf_mod.evaluate_on_scenes(model)
        summary = {k: v for k, v in stats.items() if k != "misses"}
        stats["candidate"] = name
        summary["candidate"] = name
        stats["train_secs"] = summary["train_secs"] = round(train_secs, 1)
        stats["overrides"] = summary["overrides"] = overrides
        print(f"{name}: {json.dumps(summary)}", flush=True)
        results.append(stats)
        if best is None or rank_key(stats) < rank_key(best[1]):
            best = (model, stats, dict(overrides))

    model, stats, win_overrides = best

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

    # promote only if the run's best beats the incumbent flagship artifact
    eval_path = os.path.join(tf_mod.ARTIFACT_DIR, "flagship_eval.json")
    incumbent = None
    if os.path.exists(eval_path):
        with open(eval_path) as f:
            incumbent = json.load(f)
    if incumbent is not None and rank_key(incumbent) <= rank_key(stats):
        print(f"incumbent flagship stays (recall={incumbent['recall']} "
              f"fp={incumbent['false_pos_per_scene']} vs challenger "
              f"{stats['recall']}/{stats['false_pos_per_scene']})")
        with open(sweep_path, "w") as f:
            json.dump(
                {"candidates": merged, "winner": prior.get("winner")},
                f, indent=1,
            )
        return

    checkpoint.save_cascade(tf_mod.ARTIFACT_DIR, tf_mod.SESSION_KEY, model)
    # threshold sensitivity for the winner (the reference's FDDB output is a
    # curve, not one operating point)
    stats["threshold_sensitivity"] = [
        {
            k: v
            for k, v in tf_mod.evaluate_on_scenes(
                model, threshold=t, miss_analysis=False
            ).items()
        }
        for t in (0.3, 0.7)
    ]
    with open(eval_path, "w") as f:
        json.dump({k: v for k, v in stats.items() if k != "candidate"}, f, indent=1)
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
