#!/usr/bin/env python3
"""Viola-Jones baseline + bbox overlays (reference run_inference_visual_opencv.py)."""
from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
from rapidobjectdetectionusingcascadedcnns_tpu.apps.inference_apps import (
    InferenceOCVApp,
)
from rapidobjectdetectionusingcascadedcnns_tpu.apps.visualizer import (
    InferenceVisualizerApp,
)
from rapidobjectdetectionusingcascadedcnns_tpu.data.file_list import FileListLoader

if __name__ == "__main__":
    cf.set("dataset_path_root", cf.get("dataset_native_path_root"))
    cf.set("cache_dataset", False)
    infos = FileListLoader().sample_image_infos(80, 20)
    InferenceVisualizerApp(InferenceOCVApp(), infos)
