#!/usr/bin/env python3
"""Offline dataset sampling (reference run_sampling.py): crop annotated
foreground boxes, rejection-sample clear background patches, write the
presampled corpus tree and rebuild the dataset cache."""
import os

import numpy as np

from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
from rapidobjectdetectionusingcascadedcnns_tpu.data import annotations as ann_mod
from rapidobjectdetectionusingcascadedcnns_tpu.data import cache
from rapidobjectdetectionusingcascadedcnns_tpu.data.file_list import FileListLoader
from rapidobjectdetectionusingcascadedcnns_tpu.labels import IID_FOREGROUND
from rapidobjectdetectionusingcascadedcnns_tpu.ops import sampling
from rapidobjectdetectionusingcascadedcnns_tpu.utils import log


def main(face_detector=None):
    """Offline sampling over the native corpus (reference run_sampling.py).

    ``face_detector``: optional ``image -> (K, 4) xyxy`` callable restricting
    background sampling around unannotated faces. Defaults to the OpenCV
    Viola-Jones detector when this cv2 build has objdetect
    (reference run_sampling.py:60-67,114-122); falls back to
    annotations-only restrictions otherwise.
    """
    from PIL import Image

    cf.set("dataset_path_root", cf.get("dataset_native_path_root"))
    cf.set("cache_dataset", False)
    loader = FileListLoader()
    rng = np.random.RandomState(cf.get("seed"))
    out_root = cf.ensure_dir("dataset_presampled_path_root")
    min_patch = cf.get("img_width")
    n_crops = n_bg = 0

    if face_detector is None and cf.get("foreground_equals_face"):
        face_detector = sampling.make_haar_face_detector()
        if face_detector is None:
            log.log(
                "cv2 objdetect unavailable: background sampling restricted by "
                "annotations only (reference additionally restricts "
                "Viola-Jones detections, run_sampling.py:114-122)"
            )
        else:
            log.log("background patches overlapping detected faces are rejected")

    for info in loader.image_infos:
        anns = ann_mod.get_annotations(info.path_original, info.dataset_key)
        boxes = np.stack([a.bbox for a in anns]) if anns else np.zeros((0, 4))
        try:
            img = info.raw_original()
        except Exception as exc:
            log.log(" .. Skipped {}: {}".format(info.path_original, exc))
            continue
        detected = face_detector(img) if face_detector is not None else None
        is_foreground = info.label.iid == IID_FOREGROUND
        crops, bg = sampling.sample_image_reference(
            img, boxes, is_foreground, min_patch, rng, detected_boxes=detected
        )
        base = os.path.splitext(info.basename)[0]
        # annotation crops carry the IMAGE's label; sampled patches are
        # always background (reference run_sampling.py:96-108,127-137)
        crop_label = "foreground" if is_foreground else "background"
        crop_dir = cf.ensure_dir(os.path.join(out_root, info.dataset_key, crop_label))
        bg_dir = cf.ensure_dir(os.path.join(out_root, info.dataset_key, "background"))
        for k, patch in enumerate(crops):
            Image.fromarray(patch).save(
                os.path.join(crop_dir, "aug_{}_{}.png".format(base, k))
            )
            n_crops += 1
        for k, patch in enumerate(bg):
            Image.fromarray(patch).save(
                os.path.join(bg_dir, "aug_{}_bg{}.png".format(base, k))
            )
            n_bg += 1

    log.log(
        "sampled {} annotation crops and {} background patches".format(n_crops, n_bg)
    )
    cache.clear()  # rebuild caches on next dataset load (run_sampling.py:190-215)


if __name__ == "__main__":
    main()
