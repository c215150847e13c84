#!/usr/bin/env python3
"""Train a single net (reference run_train_single.py: augmentation off)."""
from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
from rapidobjectdetectionusingcascadedcnns_tpu.apps.train_apps import TrainApp

if __name__ == "__main__":
    cf.set("data_augmentation_online", False)
    TrainApp()
