"""Record a real end-to-end random-tuning session (VERDICT r3 item 7).

The tuners are unit-tested (tests/test_tuner.py) and the tune apps have
fixture-driven tests (tests/test_tune_apps.py), but no complete
``run_tune_cascade``-style sweep had ever been RECORDED as an artifact.
This runs TuneCascadeApp(random=True) — the reference's
run_tune_cascade.py + app/tune_single_app.py:42-167 flow — for N full
cascade-training sessions on the synthetic corpus, drawing per-session
configurations from the reference's value grids (hyper_tuner.py:65-142),
and persists every session's sampled config + validation metrics + the
winner to artifacts/tuning_random.json.

Param keys: the run_tune_cascade.py defaults minus cascade_n_nets (whose
reference grid reaches 15 nets — halving 48px inputs below 1px; the
recorded session keeps the corpus fixed at the default 2-stage geometry so
all sessions are comparable).

Usage: python tools/tune_session.py [--sessions 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARTIFACT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts"
)

PARAM_KEYS = [
    "learning_rate_init",
    "batch_size",
    "max_beta",
    "min_beta",
    "fc1_size",
    "conv_filter_sizes",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sessions", type=int, default=8)
    ap.add_argument("--n-pos", type=int, default=300)
    ap.add_argument("--n-neg", type=int, default=900)
    args = ap.parse_args()

    import jax

    cache_dir = os.environ.get("RODC_JIT_CACHE", "/tmp/rodc_jit_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
    from rapidobjectdetectionusingcascadedcnns_tpu.apps.tune_apps import (
        TuneCascadeApp,
    )
    from rapidobjectdetectionusingcascadedcnns_tpu.train.cascade_trainer import (
        SyntheticProvider,
    )
    from rapidobjectdetectionusingcascadedcnns_tpu.utils import log

    log.set_echo(True)

    # small-but-real training budget per session
    cf.set("cascade_n_nets", 2)
    cf.set("img_width", 24)
    cf.set("epochs_total", 3)
    cf.set("n_max_constant_evals", None)
    cf.set("data_augmentation_online", False)
    cf.set("seed", 11)

    provider = SyntheticProvider(
        args.n_pos, args.n_neg, [12, 24], seed=9, source="mixed"
    )

    t0 = time.time()
    app = TuneCascadeApp(
        PARAM_KEYS,
        random=True,
        max_sessions=args.sessions,
        provider=provider,
        run_now=True,
    )
    wall = time.time() - t0

    tuner = app.tuner
    record = {
        "experiment": "random hyper-parameter sweep via TuneCascadeApp "
                      "(reference run_tune_cascade.py + "
                      "app/tune_single_app.py:42-167)",
        "param_keys": PARAM_KEYS,
        "n_sessions": app.n_sessions,
        "corpus": {"n_pos": args.n_pos, "n_neg": args.n_neg,
                   "sizes": [12, 24], "source": "mixed"},
        "epochs_per_session": cf.get("epochs_total"),
        "tuning_main_criteria": cf.get("tuning_main_criteria"),
        "backend": jax.default_backend(),
        "wall_secs": round(wall, 1),
        "sessions": [
            {
                "config": r["config"],
                "score": (None if r["score"] == float("-inf") else r["score"]),
                "valid_metrics": {
                    k: v for k, v in r["results"].items()
                    if isinstance(v, (int, float))
                },
            }
            for r in tuner.results
        ],
        "best": (
            {
                "config": tuner.best["config"],
                "score": tuner.best["score"],
            }
            if tuner.best is not None
            else None
        ),
        "global_best_score": (
            None if app.best_score == float("-inf") else app.best_score
        ),
    }
    path = os.path.join(ARTIFACT_DIR, "tuning_random.json")
    with open(path, "w") as f:
        json.dump(record, f, indent=1)
    print("wrote", path)
    print(json.dumps({"n_sessions": record["n_sessions"],
                      "best": record["best"]}))


if __name__ == "__main__":
    main()
