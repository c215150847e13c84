"""Hyper-parameter tuner semantics."""

import pytest

from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
from rapidobjectdetectionusingcascadedcnns_tpu.train import tuner as tuner_mod


class TestGrids:
    def test_grids_cover_reference_params(self):
        grids = tuner_mod.value_grids()
        for key in (
            "learning_rate_init",
            "batch_size",
            "momentum",
            "conv_filter_sizes",
            "max_beta",
            "dao_crop_probability",
        ):
            assert key in grids and len(grids[key]) > 1

    def test_unknown_params_filtered(self):
        t = tuner_mod.HyperTunerRandom(["learning_rate_init", "nonexistent_param"])
        assert t.param_keys == ["learning_rate_init"]


class TestConsistencyOverrides:
    def test_momentum_forces_optimizer(self):
        cf.set("optimizer", cf.OPTIMIZER_ADAM)
        tuner_mod.HyperTuner.override_configuration_entry("momentum", 0.5)
        assert cf.get("optimizer") == cf.OPTIMIZER_MOMENTUM
        assert cf.get("momentum") == 0.5

    def test_dao_enables_augmentation(self):
        cf.set("data_augmentation_online", False)
        tuner_mod.HyperTuner.override_configuration_entry("dao_horizontal_flip", True)
        assert cf.get("data_augmentation_online") is True


class TestRandomTuner:
    def test_samples_and_tracks_best(self):
        cf.set("tuning_main_criteria", "f1_score")
        t = tuner_mod.HyperTunerRandom(["learning_rate_init", "dropout_rate"], seed=0)
        scores = [0.4, 0.9, 0.6]
        for score in scores:
            t.tune()
            assert not t.finished
            for key in ("learning_rate_init", "dropout_rate"):
                assert cf.get(key) in t.grids[key]
            t.receive_results({"f1_score": score})
        assert t.best["score"] == 0.9
        t.log_best_values()


class TestSuccessiveTuner:
    def test_sweeps_sequentially_and_keeps_best(self):
        cf.set("tuning_main_criteria", "accuracy")
        t = tuner_mod.HyperTunerSuccessive(["dropout_rate"])
        grid = t.grids["dropout_rate"]
        # feed scores so the 2nd value wins and clears the 0.53 guard
        scores = [0.55, 0.80, 0.60, 0.58]
        for i, score in enumerate(scores):
            t.tune()
            assert cf.get("dropout_rate") == grid[i]
            t.receive_results({"accuracy": score})
        t.tune()  # past the end -> finish param, keep best
        assert t.best_values["dropout_rate"] == grid[1]
        assert cf.get("dropout_rate") == grid[1]

    def test_guard_discards_weak_results(self):
        cf.set("tuning_main_criteria", "accuracy")
        t = tuner_mod.HyperTunerSuccessive(["pooling_size"])
        for _ in t.grids["pooling_size"]:
            t.tune()
            t.receive_results({"accuracy": 0.40})  # below the 0.53 guard
        t.tune()
        assert "pooling_size" not in t.best_values

    def test_required_iterations(self):
        t = tuner_mod.HyperTunerSuccessive(["pooling_size", "conv_stride"])
        assert t.required_iterations() == len(t.grids["pooling_size"]) + len(
            t.grids["conv_stride"]
        )


class TestPersistence:
    def test_random_state_roundtrip(self, tmp_path):
        cf.set("tuning_main_criteria", "f1_score")
        t = tuner_mod.HyperTunerRandom(["learning_rate_init", "dropout_rate"], seed=7)
        for score in (0.4, 0.9):
            t.tune()
            t.receive_results({"f1_score": score})
        path = str(tmp_path / "tuner.json")
        t.save_state(path)

        # a FRESH process would reconstruct + resume: the rng stream, the
        # current draw, and the results history must all survive
        t2 = tuner_mod.HyperTunerRandom(["learning_rate_init", "dropout_rate"], seed=0)
        t2.load_state(path)
        assert t2.best["score"] == t.best["score"] == 0.9
        assert t2._current == t._current
        assert len(t2.results) == 2
        # identical future draws
        t.tune()
        t2.tune()
        assert t._current == t2._current

    def test_successive_state_roundtrip_and_restore(self, tmp_path):
        cf.set("tuning_main_criteria", "accuracy")
        t = tuner_mod.HyperTunerSuccessive(["dropout_rate", "pooling_size"])
        grid = t.grids["dropout_rate"]
        for score in (0.55, 0.80, 0.60, 0.58):
            t.tune()
            t.receive_results({"accuracy": score})
        t.tune()  # finishes dropout_rate, starts pooling_size
        path = str(tmp_path / "tuner.json")
        t.save_state(path)

        t2 = tuner_mod.HyperTunerSuccessive(["dropout_rate", "pooling_size"])
        t2.load_state(path)
        assert t2.best_values == {"dropout_rate": grid[1]}
        assert t2.current_param == "pooling_size"
        # the app resets config between sessions; applying the next value
        # must re-apply the kept winner (reference restore_best_values,
        # hyper_tuner_successive.py:57-76)
        cf.reset()
        t2._apply_current_settings()
        assert cf.get("dropout_rate") == grid[1]
        assert cf.get("pooling_size") == t2.grids["pooling_size"][t2._value_idx]

    def test_kind_and_keys_mismatch_rejected(self, tmp_path):
        t = tuner_mod.HyperTunerRandom(["dropout_rate"], seed=0)
        t.tune()
        path = str(tmp_path / "tuner.json")
        t.save_state(path)
        with pytest.raises(ValueError):
            tuner_mod.HyperTunerSuccessive(["dropout_rate"]).load_state(path)
        with pytest.raises(ValueError):
            tuner_mod.HyperTunerRandom(["pooling_size"], seed=0).load_state(path)

    def test_tuple_grid_values_survive_json_roundtrip(self, tmp_path):
        """JSON silently turns tuples into lists; a resumed sweep must
        re-apply values with the ORIGINAL grid type (advisor round 2)."""
        cf.set("tuning_main_criteria", "f1_score")
        t = tuner_mod.HyperTunerRandom(["dropout_rate"], seed=3)
        # a grid carrying tuple values (e.g. resize buckets in a custom grid)
        t.grids["dropout_rate"] = [(12, 12), (24, 24), (48, 48)]
        t.tune()
        t.receive_results({"f1_score": 0.7})
        path = str(tmp_path / "tuner.json")
        t.save_state(path)

        t2 = tuner_mod.HyperTunerRandom(["dropout_rate"], seed=0)
        t2.grids["dropout_rate"] = [(12, 12), (24, 24), (48, 48)]
        t2.load_state(path)
        assert isinstance(t2._current["dropout_rate"], tuple)
        assert t2._current["dropout_rate"] == t._current["dropout_rate"]
        assert isinstance(t2.best["config"]["dropout_rate"], tuple)

    def test_successive_tuple_best_values_roundtrip(self, tmp_path):
        cf.set("tuning_main_criteria", "accuracy")
        t = tuner_mod.HyperTunerSuccessive(["pooling_size"])
        t.grids["pooling_size"] = [(2, 2), (3, 3)]
        t._required_iterations = 2
        for score in (0.6, 0.8):
            t.tune()
            t.receive_results({"accuracy": score})
        t.tune()  # finishes pooling_size
        assert t.best_values == {"pooling_size": (3, 3)}
        path = str(tmp_path / "tuner.json")
        t.save_state(path)
        t2 = tuner_mod.HyperTunerSuccessive(["pooling_size"])
        t2.grids["pooling_size"] = [(2, 2), (3, 3)]
        t2.load_state(path)
        assert t2.best_values == {"pooling_size": (3, 3)}
        assert isinstance(t2.best_values["pooling_size"], tuple)
