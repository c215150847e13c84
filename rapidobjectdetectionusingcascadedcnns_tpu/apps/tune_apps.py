"""Hyper-parameter tuning applications.

Re-design of ``TuneSingleApp`` / ``TuneCascadeApp`` (app/tune_single_app.py,
app/tune_cascade_app.py): drive a tuner over training sessions, track the
global best on the main validation criteria, and survive per-session errors
(tune_single_app.py:74-88). Config state is snapshot/restored per session
instead of reloading the config module.
"""

from __future__ import annotations

import os
import traceback
from typing import List, Optional

from .. import config as cf
from ..train.tuner import HyperTuner, HyperTunerRandom, HyperTunerSuccessive
from ..utils import log
from .base import BaseApp
from .train_apps import TrainApp, TrainCascadeApp


class TuneSingleApp(BaseApp):
    trainer_class = TrainApp

    def __init__(
        self,
        param_keys: List[str],
        random: bool = False,
        max_sessions: Optional[int] = None,
        provider=None,
        state_path: Optional[str] = None,
        run_now: bool = True,
    ):
        """``state_path``: optional JSON file persisting the sweep position +
        results after every session; when it already exists, the sweep
        RESUMES from it (long sweeps survive process restarts — the
        reference tuner lives and dies with one process)."""
        self.tuner: HyperTuner = (
            HyperTunerRandom(param_keys) if random else HyperTunerSuccessive(param_keys)
        )
        self.state_path = state_path
        if state_path and os.path.exists(state_path):
            self.tuner.load_state(state_path)
            log.log("resumed tuner state from {}".format(state_path))
        self.max_sessions = max_sessions
        self.provider = provider
        self.best_score = float("-inf")
        self.best_config_snapshot = None
        self.n_sessions = 0
        BaseApp.__init__(self, run_now)

    def _create_trainer(self):
        return self.trainer_class(provider=self.provider, run_now=False)

    def _session_results(self, trainer) -> dict:
        if trainer.final_results is None:
            return {}
        return dict(trainer.final_results.get("valid", {}))

    def _main(self):
        base_snapshot = cf.snapshot()
        limit = self.max_sessions or self.tuner.required_iterations()
        repeats = cf.get("n_repeat_same_session")

        while not self.tuner.finished and self.n_sessions < limit:
            cf.restore(base_snapshot)
            cf.set("session_key", "{}_tune{:03d}".format(
                base_snapshot["session_key"], self.n_sessions
            ))
            self.tuner.tune()
            if self.tuner.finished:
                break

            for _rep in range(max(1, repeats)):
                self.n_sessions += 1
                try:
                    trainer = self._create_trainer()
                    trainer.run()
                    results = self._session_results(trainer)
                    self.tuner.receive_results(results)
                    self._track_global_best(results)
                    if self.state_path:
                        self.tuner.save_state(self.state_path)
                except Exception:
                    # a failed session must not stop the sweep
                    # (tune_single_app.py:74-88)
                    log.log(
                        "tuning session failed:\n{}".format(traceback.format_exc())
                    )
                if self.n_sessions >= limit:
                    break

        self.tuner.log_best_values()
        cf.restore(base_snapshot)

    def _track_global_best(self, results: dict) -> None:
        main = cf.get("tuning_main_criteria")
        score = results.get(main)
        if score is not None and score > self.best_score:
            self.best_score = score
            self.best_config_snapshot = cf.snapshot()
            log.log(
                "new global tuning best: {} = {:.4f}".format(main, score)
            )


class TuneCascadeApp(TuneSingleApp):
    """Same sweep driving cascade training (app/tune_cascade_app.py:5-9)."""

    trainer_class = TrainCascadeApp

    def _session_results(self, trainer) -> dict:
        if not trainer.final_results:
            return {}
        return dict(trainer.final_results.get("valid", {}))
