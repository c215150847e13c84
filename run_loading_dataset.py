#!/usr/bin/env python3
"""Warm the dataset cache (reference run_loading_dataset.py)."""
from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
from rapidobjectdetectionusingcascadedcnns_tpu.data.loader import DiskDatasetProvider

if __name__ == "__main__":
    DiskDatasetProvider().dataset(cf.get("img_width"))
