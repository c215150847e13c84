#!/usr/bin/env python3
"""Hyper-parameter sweep for single-net training (reference run_tune_single.py)."""
from rapidobjectdetectionusingcascadedcnns_tpu.apps.tune_apps import TuneSingleApp

PARAM_KEYS = [
    "learning_rate_init",
    "batch_size",
    "dropout_rate",
    "fc1_size",
    "conv_filter_sizes",
]

if __name__ == "__main__":
    TuneSingleApp(PARAM_KEYS)
