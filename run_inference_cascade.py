#!/usr/bin/env python3
"""Cascade inference on a sampled image set (reference run_inference_cascade.py)."""
from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
from rapidobjectdetectionusingcascadedcnns_tpu.apps.inference_apps import (
    InferenceCascadeApp,
)
from rapidobjectdetectionusingcascadedcnns_tpu.data.file_list import FileListLoader

if __name__ == "__main__":
    cf.set("dataset_path_root", cf.get("dataset_native_path_root"))
    cf.set("cache_dataset", False)
    app = InferenceCascadeApp()
    infos = FileListLoader().sample_image_infos(80, 20)
    app.run_inference_on_images(infos, merge=cf.get("inference_merge"))
