#!/usr/bin/env python3
"""Train the boosted cascade (reference run_train_cascade.py)."""
from rapidobjectdetectionusingcascadedcnns_tpu.apps.train_apps import TrainCascadeApp

if __name__ == "__main__":
    TrainCascadeApp()
