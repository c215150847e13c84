#!/usr/bin/env python3
"""Random hyper-parameter search for cascade training (reference run_tune_cascade.py)."""
from rapidobjectdetectionusingcascadedcnns_tpu.apps.tune_apps import TuneCascadeApp

PARAM_KEYS = [
    "learning_rate_init",
    "batch_size",
    "max_beta",
    "min_beta",
    "cascade_n_nets",
    "fc1_size",
    "conv_filter_sizes",
]

if __name__ == "__main__":
    TuneCascadeApp(PARAM_KEYS, random=True)
