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
    # (name, n_pos, n_neg, epochs, seed)
    ("base-s0", 3000, 24000, 16, 0),
    ("base-s1", 3000, 24000, 16, 1),
    ("big-s0", 5000, 40000, 20, 0),
    ("big-s2", 5000, 40000, 20, 2),
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
    for name, n_pos, n_neg, epochs, seed in CANDIDATES:
        if only and name not in only:
            continue
        cf.reset()
        tf_mod.flagship_config(cf)
        cf.set("epochs_total", epochs)
        provider = ct.SyntheticProvider(
            n_pos, n_neg, [12, 24, 48], seed=seed, source="mixed"
        )
        trainer = ct.CascadeTrainer(provider, seed=seed)
        t0 = time.time()
        model = trainer.train()
        train_secs = time.time() - t0
        stats = tf_mod.evaluate_on_scenes(model)
        stats["candidate"] = name
        stats["train_secs"] = round(train_secs, 1)
        print(f"{name}: {json.dumps(stats)}", flush=True)
        results.append(stats)
        if best is None or rank_key(stats) < rank_key(best[1]):
            best = (model, stats)

    model, stats = best
    checkpoint.save_cascade(tf_mod.ARTIFACT_DIR, tf_mod.SESSION_KEY, model)
    with open(os.path.join(tf_mod.ARTIFACT_DIR, "flagship_eval.json"), "w") as f:
        json.dump({k: v for k, v in stats.items() if k != "candidate"}, f, indent=1)
    with open(os.path.join(tf_mod.ARTIFACT_DIR, "flagship_sweep.json"), "w") as f:
        json.dump({"candidates": results, "winner": stats["candidate"]}, f, indent=1)
    print(f"winner: {stats['candidate']} recall={stats['recall']} "
          f"fp/scene={stats['false_pos_per_scene']} "
          f"survivors_max={stats['survivors_max']}")


if __name__ == "__main__":
    main()
