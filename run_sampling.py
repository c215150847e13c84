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


def main():
    from PIL import Image

    cf.set("dataset_path_root", cf.get("dataset_native_path_root"))
    cf.set("cache_dataset", False)
    loader = FileListLoader()
    rng = np.random.RandomState(cf.get("seed"))
    out_root = cf.ensure_dir("dataset_presampled_path_root")
    min_patch = cf.get("img_width")
    n_fg = n_bg = 0

    for info in loader.image_infos:
        anns = ann_mod.get_annotations(info.path_original, info.dataset_key)
        boxes = np.stack([a.bbox for a in anns]) if anns else np.zeros((0, 4))
        if info.label.iid != IID_FOREGROUND and len(boxes) == 0:
            # plain background image: copy-through directory layout
            continue
        try:
            img = info.raw_original()
        except Exception as exc:
            log.log(" .. Skipped {}: {}".format(info.path_original, exc))
            continue
        fg, bg = sampling.sample_image(img, boxes, min_patch, rng)
        base = os.path.splitext(info.basename)[0]
        fg_dir = cf.ensure_dir(os.path.join(out_root, info.dataset_key, "foreground"))
        bg_dir = cf.ensure_dir(os.path.join(out_root, info.dataset_key, "background"))
        for k, patch in enumerate(fg):
            Image.fromarray(patch).save(
                os.path.join(fg_dir, "aug_{}_{}.png".format(base, k))
            )
            n_fg += 1
        for k, patch in enumerate(bg):
            Image.fromarray(patch).save(
                os.path.join(bg_dir, "aug_{}_bg{}.png".format(base, k))
            )
            n_bg += 1

    log.log("sampled {} foreground and {} background patches".format(n_fg, n_bg))
    cache.clear()  # rebuild caches on next dataset load (run_sampling.py:190-215)


if __name__ == "__main__":
    main()
