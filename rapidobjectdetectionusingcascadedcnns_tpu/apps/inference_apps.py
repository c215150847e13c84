"""Inference applications.

Re-design of the reference inference app family:
  * :class:`AbstractInferenceApp` — the batch-of-images driver with runtime
    stat logging (app/abstract_inference_app.py:38-154). The merge mode's
    host-threaded window extraction is gone by design: window extraction IS
    the device program, so "merge" maps to batched frames per device call.
  * :class:`InferenceApp` — single pretrained net
    (app/inference_app.py:24-300).
  * :class:`InferenceCascadeApp` — pretrained cascade discovered by probing
    per-stage artifacts (app/inference_cascade_app.py:36-60).
  * :class:`InferenceOCVApp` — the OpenCV Viola-Jones baseline
    (app/inference_ocv_app.py); optional, host-only, requires a cv2 build
    with the objdetect module.
"""

from __future__ import annotations

import abc
from typing import List, Optional, Sequence

import numpy as np

from .. import config as cf
from ..models.cascade import CascadeDetector, DetectionResult
from ..models.single import SingleNetDetector
from ..train import checkpoint
from ..utils import log
from ..utils.time_watcher import TimeWatcher
from .base import BaseApp


class AbstractInferenceApp(BaseApp):
    """Common driver: images -> per-image detections, with runtime stats."""

    def __init__(self):
        BaseApp.__init__(self, run_now=False)

    def _main(self):
        pass

    @abc.abstractmethod
    def run_inference_on_image(self, image: np.ndarray) -> DetectionResult:
        ...

    @abc.abstractmethod
    def run_inference_on_images_impl(
        self, images: Sequence[np.ndarray]
    ) -> List[DetectionResult]:
        ...

    def run_inference_on_images(
        self, images: Sequence, merge: bool = True
    ) -> List[DetectionResult]:
        """images: arrays or ImageInfo objects. ``merge`` batches frames into
        fused device calls; non-merge processes strictly per image with
        per-image error isolation (abstract_inference_app.py:107-126)."""
        arrays: List[Optional[np.ndarray]] = []
        for img in images:
            if hasattr(img, "raw_original"):
                try:
                    arrays.append(img.raw_original())
                except Exception as exc:
                    log.log(" .. Skipped {}: {}".format(getattr(img, "path_original", "?"), exc))
                    arrays.append(None)
            else:
                arrays.append(np.asarray(img))

        timer = TimeWatcher("inference_img_multiple: {} imgs".format(len(arrays)), quiet=True)
        empty = DetectionResult(
            boxes=np.zeros((0, 4)),
            confidences=np.zeros((0,)),
            raw_boxes=np.zeros((0, 4)),
            raw_confidences=np.zeros((0,)),
            n_windows=0,
            n_survivors_per_stage=[],
        )
        if merge:
            valid = [(i, a) for i, a in enumerate(arrays) if a is not None]
            results: List[DetectionResult] = [empty] * len(arrays)
            if valid:
                out = self.run_inference_on_images_impl([a for _, a in valid])
                for (i, _), res in zip(valid, out):
                    results[i] = res
        else:
            results = []
            for a in arrays:
                if a is None:
                    results.append(empty)
                    continue
                try:
                    results.append(self.run_inference_on_image(a))
                except Exception as exc:
                    log.log(" .. Skipped an image, because of an error: {}".format(exc))
                    results.append(empty)

        total = timer.stop()
        log.log(
            "Runtime inference including window extraction: {} images in {} "
            "(avg: {}).".format(
                len(arrays),
                TimeWatcher.seconds_to_str(total),
                TimeWatcher.seconds_to_str(total / max(len(arrays), 1)),
            )
        )
        return results


class InferenceApp(AbstractInferenceApp):
    """Single-net inference from an exported model artifact."""

    def __init__(self, model_session_key: Optional[str] = None):
        super().__init__()
        self.model_session_key = model_session_key or cf.get(
            "default_evaluation_model_single"
        )
        log.log("Initializing inference app with the following settings:")
        log.log(" - pre-trained model: {}".format(self.model_session_key))
        log.log(" - min_window_length: {}".format(cf.get("min_window_length")))
        log.log(" - window_scale_factor: {}".format(cf.get("window_scale_factor")))
        log.log(" - nms: {}".format(cf.get("nms")))
        self._detector: Optional[SingleNetDetector] = None

    @property
    def detector(self) -> SingleNetDetector:
        if self._detector is None:
            params, cfg, mean, std, _ = checkpoint.load_single(
                cf.get("output_graph_dir"), self.model_session_key
            )
            self._detector = SingleNetDetector(params, cfg, mean, std)
            # input dims come from the artifact, like the reference derives
            # them from graph tensor shapes (inference_app.py:276-295)
            cf.set("img_width", cfg.input_size)
            cf.set("img_height", cfg.input_size)
        return self._detector

    def run_inference_on_image(self, image):
        return self.detector.detect(image)

    def run_inference_on_images_impl(self, images):
        return self.detector.detect_batch(list(images))

    def run_inference_on_raw_data(self, raw_data: np.ndarray) -> np.ndarray:
        """Classify pre-extracted patches (inference_app.py:156-166)."""
        return self.detector.classify_patches(raw_data)


class InferenceCascadeApp(AbstractInferenceApp):
    """Cascade inference from exported per-stage artifacts."""

    def __init__(self, model_session_key: Optional[str] = None, model=None):
        super().__init__()
        self.model_session_key = model_session_key or cf.get(
            "default_evaluation_model_cascade"
        )
        self._model = model
        self._detector: Optional[CascadeDetector] = None

    @property
    def detector(self) -> CascadeDetector:
        if self._detector is None:
            model = self._model
            if model is None:
                model = checkpoint.load_cascade(
                    cf.get("output_graph_dir"), self.model_session_key
                )
            log.log("the loaded cascade contains {} nets".format(model.n_nets))
            self._detector = CascadeDetector(model)
            cf.set("img_width", model.input_sizes[-1])
            cf.set("img_height", model.input_sizes[-1])
        return self._detector

    def run_inference_on_image(self, image):
        return self.detector.detect(image)

    def run_inference_on_images_impl(self, images):
        return self.detector.detect_batch(list(images))


class InferenceOCVApp(AbstractInferenceApp):
    """OpenCV Viola-Jones baseline (app/inference_ocv_app.py:35-61).

    Baseline-only, host-only; not on the TPU path by design (SURVEY.md
    §2.7). Uses cv2's CascadeClassifier when this build has objdetect,
    otherwise the in-repo evaluator (ops/viola_jones.py) runs the same
    pretrained XML — the baseline is executable either way.
    """

    def __init__(self, cascade_xml_path: Optional[str] = None):
        super().__init__()
        from ..ops import viola_jones as vj

        self._classifier = None
        try:
            import cv2

            if hasattr(cv2, "CascadeClassifier"):
                path = vj.default_cascade_path(cascade_xml_path)
                if path:
                    self._classifier = cv2.CascadeClassifier(path)
        except ImportError:  # pragma: no cover - cv2 present in CI image
            pass
        if self._classifier is None:
            self._classifier = vj.VJDetector(cascade_xml_path)

    def run_inference_on_image(self, image):
        from ..ops import viola_jones as vj

        gray = vj.rgb_to_gray_u8(image)
        rects = self._classifier.detectMultiScale(
            gray,
            scaleFactor=cf.get("window_scale_factor"),
            minNeighbors=cf.get("nms_opencv_min_neighbors"),
        )
        if len(rects) == 0:
            boxes = np.zeros((0, 4))
        else:
            rects = np.asarray(rects, np.float64)
            boxes = np.stack(
                [rects[:, 0], rects[:, 1], rects[:, 0] + rects[:, 2], rects[:, 1] + rects[:, 3]],
                axis=1,
            )
        conf = np.ones((len(boxes),))
        return DetectionResult(boxes, conf, boxes, conf, 0, [])

    def run_inference_on_images_impl(self, images):
        # non-merge only, like the reference forces (inference_ocv_app.py:26)
        return [self.run_inference_on_image(img) for img in images]
