"""TuneSingleApp / TuneCascadeApp sweep drivers (app/tune_single_app.py,
app/tune_cascade_app.py): config isolation per session, failure tolerance,
global-best tracking, and cross-process sweep resume via state_path."""

import os

import numpy as np

from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
from rapidobjectdetectionusingcascadedcnns_tpu.apps import tune_apps


class _StubTrainer:
    """Stands in for TrainApp: returns a canned score per dropout value so
    the sweep logic is exercised without training."""

    scores = {0.25: 0.56, 0.75: 0.81, 0.5: 0.61, 1.0: 0.58}
    raise_on = set()
    calls = 0

    def __init__(self, provider=None, run_now=False):
        pass

    def run(self):
        type(self).calls += 1
        if cf.get("dropout_rate") in self.raise_on:
            raise RuntimeError("session blew up")
        self.final_results = {
            "valid": {"accuracy": self.scores[cf.get("dropout_rate")]}
        }


class _StubTuneApp(tune_apps.TuneSingleApp):
    trainer_class = _StubTrainer

    def _create_trainer(self):
        return _StubTrainer()


def _setup():
    cf.set("tuning_main_criteria", "accuracy")
    cf.set("n_repeat_same_session", 1)
    _StubTrainer.calls = 0
    _StubTrainer.raise_on = set()


def test_sweep_tracks_global_best_and_restores_config():
    _setup()
    before = cf.get("dropout_rate")
    app = _StubTuneApp(["dropout_rate"])
    assert app.best_score == 0.81
    assert app.best_config_snapshot["dropout_rate"] == 0.75
    # per-session mutations must not leak out of the sweep
    assert cf.get("dropout_rate") == before
    assert _StubTrainer.calls == len(cf and [0.25, 0.75, 0.5, 1.0])


def test_failed_session_does_not_stop_the_sweep():
    _setup()
    _StubTrainer.raise_on = {0.75}
    app = _StubTuneApp(["dropout_rate"])
    # the winner crashed, so the next best value wins
    assert app.best_score == 0.61
    assert _StubTrainer.calls == 4


def test_sweep_resumes_from_state_path(tmp_path):
    """An interrupted sweep picks up where it left off in a new app/process
    (the reference tuner cannot survive its process)."""
    _setup()
    path = str(tmp_path / "sweep.json")
    first = _StubTuneApp(["dropout_rate"], max_sessions=2, state_path=path)
    assert _StubTrainer.calls == 2
    assert os.path.exists(path)
    assert first.best_score == 0.81

    # "new process": fresh app, same state file
    resumed = _StubTuneApp(["dropout_rate"], state_path=path)
    # only the remaining grid values run
    assert _StubTrainer.calls == 2 + 2
    # the kept winner reflects the FULL grid's history
    assert resumed.tuner.best_values["dropout_rate"] == 0.75


def test_cascade_variant_shares_the_driver():
    _setup()

    class _StubCascadeApp(tune_apps.TuneCascadeApp):
        def _create_trainer(self):
            return _StubTrainer()

    app = _StubCascadeApp(["dropout_rate"])
    assert app.best_score == 0.81
