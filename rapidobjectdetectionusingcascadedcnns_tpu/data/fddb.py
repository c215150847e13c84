"""FDDB benchmark IO: fold parsing and the official detection format.

Mirrors the reference FDDB harness IO (app/evaluate_fddb_app.py:71-137):
fold files list relative image paths; detections are exported as

    <image key>
    <n faces>
    <left_x top_y width height detection_score>*

one file per fold, ready for the official Perl evaluator.
"""

from __future__ import annotations

import os
from typing import List, Sequence

import numpy as np

from .. import config as cf
from ..labels import get_by_key, KEY_FOREGROUND
from .image_io import ImageInfo


def fold_file_path(fold_nr: int) -> str:
    return os.path.join(cf.get("fddb_folds_dir"), "FDDB-fold-{:02d}.txt".format(fold_nr))


def read_fold(fold_nr: int) -> List[str]:
    """Relative image keys of one fold (order preserved)."""
    with open(fold_file_path(fold_nr)) as f:
        return [line.strip() for line in f if line.strip()]


def image_infos_for_fold(fold_nr: int) -> List[ImageInfo]:
    """ImageInfo objects for a fold (app/evaluate_fddb_app.py:71-93)."""
    infos = []
    for rel in read_fold(fold_nr):
        path = os.path.join(cf.get("fddb_img_base_dir"), rel + ".jpg")
        infos.append(ImageInfo(path, get_by_key(KEY_FOREGROUND), "fddb"))
    return infos


def image_key(image_path: str) -> str:
    key = image_path.replace(cf.get("fddb_img_base_dir"), "").replace(".jpg", "")
    return key[1:] if key.startswith("/") else key


def format_fold_results(
    img_keys: Sequence[str],
    boxes_per_img: Sequence[np.ndarray],
    confidences_per_img: Sequence[np.ndarray],
) -> str:
    """Detection-format text for one fold (app/evaluate_fddb_app.py:106-134)."""
    lines: List[str] = []
    for key, boxes, confs in zip(img_keys, boxes_per_img, confidences_per_img):
        lines.append(key)
        lines.append(str(len(boxes)))
        for box, conf in zip(boxes, confs):
            xmin, ymin, xmax, ymax = box
            lines.append(
                "{} {} {} {} {}".format(xmin, ymin, xmax - xmin, ymax - ymin, conf)
            )
    return "\n".join(lines) + "\n"


def write_fold_results(
    export_dir: str,
    fold_nr: int,
    img_keys: Sequence[str],
    boxes_per_img: Sequence[np.ndarray],
    confidences_per_img: Sequence[np.ndarray],
) -> str:
    cf.ensure_dir(export_dir)
    path = os.path.join(export_dir, "fold-{:02d}-out.txt".format(fold_nr))
    with open(path, "w") as f:
        f.write(format_fold_results(img_keys, boxes_per_img, confidences_per_img))
    return path
