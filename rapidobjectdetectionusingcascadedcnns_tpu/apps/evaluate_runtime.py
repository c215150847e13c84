"""Runtime benchmark: cascade vs single net, per compute platform.

Re-design of ``EvaluateRuntimeApp`` (app/evaluate_runtime_app.py:50-97). The
reference compared {cascade, single} x {GPU, CPU}; the TPU-native analog is
{cascade, single} x {accelerator backend, host CPU}: pass
``compare_platforms=["tpu", "cpu"]`` and the app re-initializes the JAX
backend per platform (utils/device.force_platform — unlike the reference's
CpuGpuSwitcher, which could not switch after init) and benchmarks both
families on each. Default (None) benchmarks on the current backend only.
Images default to a synthetic sampled set (80 positive scenes /
20 background scenes), or a pos/neg sample of the configured disk corpus.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence

import numpy as np

from .. import config as cf
from ..utils import log
from .base import BaseApp
from .inference_apps import InferenceApp, InferenceCascadeApp


class EvaluateRuntimeApp(BaseApp):
    def __init__(
        self,
        cascade_session_key: Optional[str] = None,
        single_session_key: Optional[str] = None,
        n_positive: int = 80,
        n_negative: int = 20,
        images: Optional[Sequence[np.ndarray]] = None,
        cascade_model=None,
        single_detector=None,
        compare_platforms: Optional[Sequence[str]] = None,
        run_now: bool = True,
    ):
        self.cascade_session_key = cascade_session_key
        self.single_session_key = single_session_key
        self.n_positive = n_positive
        self.n_negative = n_negative
        self._images = images
        self._cascade_model = cascade_model
        self._single_detector = single_detector
        self.compare_platforms = list(compare_platforms or [])
        self.results: Dict[str, Dict[str, float]] = {}
        BaseApp.__init__(self, run_now)

    def _collect_images(self) -> List[np.ndarray]:
        if self._images is not None:
            return list(self._images)
        if cf.get("dataset_keys") == ["synthetic"]:
            from ..data.synthetic import make_scene

            scenes = []
            for s in range(self.n_positive):
                scenes.append(make_scene(480, 640, 2, seed=s).image)
            for s in range(self.n_negative):
                scenes.append(make_scene(480, 640, 0, seed=1000 + s).image)
            return scenes
        from ..data.file_list import FileListLoader

        infos = FileListLoader().sample_image_infos(self.n_positive, self.n_negative)
        return [i.raw_original() for i in infos]

    def _bench(self, name: str, app) -> None:
        images = self._images_cache
        # warm with the full set once: compiles every program shape the
        # timed run uses (incl. the batched-frames program at its real batch
        # size), so the measurement is steady-state throughput
        app.run_inference_on_images(images, merge=cf.get("inference_merge"))
        start = time.perf_counter()
        app.run_inference_on_images(images, merge=cf.get("inference_merge"))
        elapsed = time.perf_counter() - start
        self.results[name] = {
            "total_seconds": elapsed,
            "avg_seconds_per_image": elapsed / len(images),
            "fps": len(images) / elapsed,
        }
        log.log(
            "{}: {} images in {:.2f}s (avg {:.3f}s, {:.1f} fps)".format(
                name,
                len(images),
                elapsed,
                elapsed / len(images),
                len(images) / elapsed,
            )
        )

    def _bench_families(self, suffix: str = "") -> None:
        """Benchmark both detector families on the CURRENT backend."""
        cascade_app = InferenceCascadeApp(
            self.cascade_session_key, model=self._cascade_model
        )
        self._bench("cascade" + suffix, cascade_app)

        if self._single_detector is not None:
            from ..models.single import SingleNetDetector

            sd = self._single_detector
            # rebuild on the current backend (params normalized to host
            # memory in _main when platform comparison is on)
            detector = SingleNetDetector(sd.params, sd.stage_config,
                                         np.asarray(sd.mean), np.asarray(sd.std))
            single_app = InferenceApp.__new__(InferenceApp)
            InferenceApp.__init__(single_app, self.single_session_key or "unused")
            single_app._detector = detector
        else:
            single_app = InferenceApp(self.single_session_key)
        self._bench("single" + suffix, single_app)

        speedup = (
            self.results["single" + suffix]["avg_seconds_per_image"]
            / self.results["cascade" + suffix]["avg_seconds_per_image"]
        )
        log.log("cascade speedup over single net{}: {:.2f}x".format(suffix, speedup))
        self.results["speedup_cascade_vs_single" + suffix] = {"value": speedup}

    def _main(self):
        self._images_cache = self._collect_images()
        if not self.compare_platforms:
            self._bench_families()
            return

        # platform comparison: model parameters must live in HOST memory so
        # they survive backend re-initialization (force_platform clears all
        # device buffers)
        import jax

        from ..utils import device

        if self._cascade_model is not None:
            self._cascade_model.stage_params = [
                jax.tree_util.tree_map(np.asarray, p)
                for p in self._cascade_model.stage_params
            ]
        if self._single_detector is not None:
            self._single_detector.params = jax.tree_util.tree_map(
                np.asarray, self._single_detector.params
            )
            self._single_detector.mean = np.asarray(self._single_detector.mean)
            self._single_detector.std = np.asarray(self._single_detector.std)

        # restore by REGISTRATION name (what jax_platforms accepts): a
        # plugin backend's devices may report a different .platform (the
        # tunneled TPU registers as 'axon' but reports 'tpu')
        original = jax.config.jax_platforms or device.current_platform()
        try:
            for platform in self.compare_platforms:
                device.force_platform(platform)
                self._bench_families("@" + platform)
        finally:
            try:
                device.force_platform(original)
            except Exception as exc:  # pragma: no cover - env-specific
                log.log("platform restore failed: {}".format(exc))
