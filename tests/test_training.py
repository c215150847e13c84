"""Training loop + cascade boosting end-to-end on synthetic data.

This is milestone M1 of SURVEY.md §7: a net trains end-to-end and reaches
high accuracy on a fixture dataset; the cascade driver chains bottlenecks,
re-weights samples and produces a working CascadeModel.
"""

import numpy as np
import pytest

from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
from rapidobjectdetectionusingcascadedcnns_tpu.train import (
    cascade_trainer as ct,
)
from rapidobjectdetectionusingcascadedcnns_tpu.train import optimizer as opt_mod
from rapidobjectdetectionusingcascadedcnns_tpu.train.trainer import SingleNetTrainer


def _fast_config():
    cf.set("conv_filter_sizes", [8])
    cf.set("fc1_size", 32)
    cf.set("batch_size", 64)
    cf.set("max_batch_size", 256)
    cf.set("epochs_total", 3)
    cf.set("compute_dtype", "float32")
    cf.set("data_augmentation_online", False)
    cf.set("optimizer", cf.OPTIMIZER_ADAM)
    cf.set("learning_rate_init", 0.003)
    cf.set("dropout_rate", 1.0)


class TestLrSchedule:
    def test_staircase_decay_with_floor(self):
        sched = opt_mod.exponential_decay_staircase(0.1, 0.5, 10, 0.02)
        assert float(sched(0)) == pytest.approx(0.1)
        assert float(sched(9)) == pytest.approx(0.1)
        assert float(sched(10)) == pytest.approx(0.05)
        assert float(sched(20)) == pytest.approx(0.025)
        assert float(sched(100)) == pytest.approx(0.02)  # floored


class TestSingleNet:
    def test_learns_synthetic_patches(self):
        _fast_config()
        provider = ct.SyntheticProvider(150, 150, [12], seed=1)
        ds = provider.dataset(12)
        trainer = SingleNetTrainer(ds, f_beta=None, seed=0)
        trainer.train()
        res = trainer.evaluate_split(ds.valid)
        assert res["accuracy"] > 0.8, res

    def test_fbeta_loss_trains(self):
        _fast_config()
        provider = ct.SyntheticProvider(60, 180, [12], seed=2)
        ds = provider.dataset(12)
        trainer = SingleNetTrainer(ds, f_beta=4.0, seed=0)
        trainer.train()
        res = trainer.evaluate_split(ds.valid)
        # recall-heavy loss: recall must be high even if precision lags
        assert res["recall"] > 0.7, res

    def test_fbeta_disabled_when_positives_dominate(self):
        _fast_config()
        provider = ct.SyntheticProvider(180, 60, [12], seed=3)
        ds = provider.dataset(12)
        trainer = SingleNetTrainer(ds, f_beta=4.0, seed=0)
        assert trainer.f_beta is None  # net_trainable.py:66-69

    def test_predict_returns_probs_and_updates_bottlenecks(self):
        _fast_config()
        cf.set("epochs_total", 1)
        provider = ct.SyntheticProvider(40, 40, [12], seed=4)
        ds = provider.dataset(12)
        trainer = SingleNetTrainer(ds, nr=1, nr_max=2, seed=0)
        trainer.train()
        pred, probs = trainer.predict(
            ds.train, update_bottlenecks=True, return_probabilities=True
        )
        assert pred.shape == (ds.train.n_samples,)
        assert probs.shape == (ds.train.n_samples, 2)
        np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)
        assert ds.train.bottlenecks is not None
        assert ds.train.bottlenecks.shape == (
            ds.train.n_samples,
            trainer.bottleneck_out_size,
        )

    def test_last_net_skips_bottleneck_update(self):
        _fast_config()
        cf.set("epochs_total", 1)
        provider = ct.SyntheticProvider(40, 40, [12], seed=5)
        ds = provider.dataset(12)
        trainer = SingleNetTrainer(ds, nr=2, nr_max=2, seed=0)
        trainer.train()
        trainer.predict(ds.train, update_bottlenecks=True)
        assert ds.train.bottlenecks is None


class TestAugmentedTraining:
    def test_training_with_online_augmentation(self):
        """The in-jit augmentation path trains without breaking (flip +
        color + crop enabled, like the reference's default dao_ settings)."""
        _fast_config()
        cf.set("data_augmentation_online", True)
        cf.set("dao_horizontal_flip", True)
        cf.set("dao_color_distortion", True)
        cf.set("dao_color_distortion_fast_mode", True)
        cf.set("dao_crop_probability", 0.5)
        cf.set("epochs_total", 2)
        provider = ct.SyntheticProvider(80, 80, [12], seed=21)
        ds = provider.dataset(12)
        trainer = SingleNetTrainer(ds, seed=0)
        trainer.train()
        res = trainer.evaluate_split(ds.valid)
        assert np.isfinite(trainer._last_loss)
        assert res["accuracy"] > 0.5, res


class TestHardNegatives:
    def test_provider_appends_mined_negatives_at_all_resolutions(self):
        """SyntheticProvider(hard_negatives=...) grows the corpus by the
        mined count with label 0, and derives lower stage resolutions by
        the same aligned block-mean as the scene corpus (the bootstrap step
        of the reference's sampling design, tools/mine_hard_negatives.py)."""
        _fast_config()
        rng = np.random.RandomState(7)
        mined = rng.randint(0, 255, size=(10, 24, 24, 3)).astype(np.uint8)
        base = ct.SyntheticProvider(20, 20, [12, 24], seed=5)
        prov = ct.SyntheticProvider(
            20, 20, [12, 24], seed=5, hard_negatives=mined
        )
        assert len(prov._labels) == len(base._labels) + 10
        assert int(prov._labels.sum()) == int(base._labels.sum())  # all label 0
        # the mined patches appear verbatim at the top resolution
        top_imgs = prov._images[24]
        assert any(
            (top_imgs == m).all(axis=(1, 2, 3)).any() for m in mined[:3]
        )
        # and the 12px view is the aligned 2x2 block-mean of the 24px view
        m0 = mined[0]
        down = np.clip(
            np.round(m0.reshape(12, 2, 12, 2, 3).mean(axis=(1, 3))), 0, 255
        ).astype(np.uint8)
        assert (prov._images[12] == down).all(axis=(1, 2, 3)).any()

    def test_wrong_resolution_rejected(self):
        _fast_config()
        mined = np.zeros((3, 16, 16, 3), np.uint8)
        with pytest.raises(ValueError):
            ct.SyntheticProvider(8, 8, [12, 24], seed=5, hard_negatives=mined)


class TestSnapshotResume:
    def test_resume_from_exported_stage(self, tmp_path):
        """snapshot_full_path warm-starts training (config.py:142-144,
        net.py:260-262)."""
        _fast_config()
        cf.set("epochs_total", 1)
        provider = ct.SyntheticProvider(40, 40, [12], seed=22)
        ds = provider.dataset(12)
        first = SingleNetTrainer(ds, seed=0)
        first.train()
        path = first.export(str(tmp_path), "warmstart")

        resumed = SingleNetTrainer(ds, seed=1, snapshot_full_path=path)
        a = np.asarray(first.state.params["fc1"]["W"])
        b = np.asarray(resumed.state.params["fc1"]["W"])
        np.testing.assert_array_equal(a, b)
        resumed.train()  # continues fine from the warm start


class TestReweighting:
    def test_adaboost_like_downweights_predicted_background(self):
        w = np.full(10, 0.1)
        actual = np.array([1, 1, 1, 1, 1, 0, 0, 0, 0, 0])
        predicted = np.array([1, 1, 1, 1, 0, 0, 0, 0, 0, 0])  # one fn -> error 0.1
        new = ct.reweight_adaboost_like(w, predicted, actual)
        assert new.sum() == pytest.approx(1.0)
        # predicted-background samples were downweighted relative to foreground
        assert new[5] < new[0]
        assert new[4] < new[0]  # the false negative was predicted background too

    def test_adaboost_resets_on_degenerate_error(self):
        w = np.full(4, 0.25)
        actual = np.array([1, 1, 0, 0])
        new = ct.reweight_adaboost_like(w, actual.copy(), actual)  # error == 0
        np.testing.assert_allclose(new, 0.25)

    def test_confidence_reweighting(self):
        acc = np.ones(4)
        probs = np.array([0.9, 0.1, 0.8, 0.2])
        actual = np.array([1, 0, 1, 0])
        new = ct.reweight_confidence(acc, probs, actual)
        np.testing.assert_allclose(new, [1.0, 0.1, 1.0, 0.2])

    def test_stage_beta_interpolation(self):
        cf.set("f_beta_cascade_loss", True)
        cf.set("max_beta", 24)
        cf.set("min_beta", 1)
        cf.set("f_beta_cascade_loss_very_last", True)
        assert ct.stage_beta(0, 3) == pytest.approx(24.0)
        assert ct.stage_beta(1, 3) == pytest.approx(12.5)
        assert ct.stage_beta(2, 3) == pytest.approx(1.0)
        cf.set("f_beta_cascade_loss_very_last", False)
        assert ct.stage_beta(2, 3) is None  # CE for the very last net


class TestCascadeTraining:
    def test_cascade_end_to_end(self):
        _fast_config()
        cf.set("cascade_n_nets", 3)
        cf.set("img_width", 48)
        cf.set("epochs_total", 2)
        cf.set("max_beta", 4)
        # tiny run evaluates every iteration; don't trip the constant guard
        # while the net is still warming up
        cf.set("n_max_constant_evals", None)
        # realistic cascades are background-dominated
        provider = ct.SyntheticProvider(80, 240, [12, 24, 48], seed=7)
        trainer = ct.CascadeTrainer(provider, seed=0)
        model = trainer.train()

        assert model.n_nets == 3
        assert model.input_sizes == [12, 24, 48]
        # bottleneck chaining widths: 32, 64, (last net unused downstream)
        assert model.stage_configs[0].bottleneck_in_size is None
        assert model.stage_configs[1].bottleneck_in_size == 32
        assert model.stage_configs[2].bottleneck_in_size == 64
        # combined evaluation was produced for every split
        assert set(trainer.combined_results.keys()) == {"train", "valid", "test"}
        combined = trainer.combined_results["valid"]
        assert combined["accuracy"] > 0.6, combined

    def test_cascade_per_stage_conv_widths(self):
        """conv_filter_sizes_per_stage gives each stage its own trunk width
        (TPU addition — stage 0 sees every pyramid window, so a narrow
        stage-0 trunk with deeper later stages is the device-cost trade);
        the per-stage widths land in the saved stage_configs and the global
        conv_filter_sizes is restored afterwards."""
        _fast_config()
        cf.set("cascade_n_nets", 2)
        cf.set("img_width", 24)
        cf.set("epochs_total", 1)
        cf.set("conv_filter_sizes", [32])
        cf.set("conv_filter_sizes_per_stage", [[16], [24, 24]])
        provider = ct.SyntheticProvider(40, 40, [12, 24], seed=9)
        model = ct.CascadeTrainer(provider, seed=0).train()

        assert model.stage_configs[0].conv_filter_sizes == (16,)
        assert model.stage_configs[1].conv_filter_sizes == (24, 24)
        assert cf.get("conv_filter_sizes") == [32]
        # the trained mixed-width cascade must run end-to-end
        from rapidobjectdetectionusingcascadedcnns_tpu.data import synthetic
        from rapidobjectdetectionusingcascadedcnns_tpu.models import cascade as casc

        scene = synthetic.make_scene(96, 96, n_faces=1, seed=3, min_face=32,
                                     max_face=48)
        casc.CascadeDetector(model).detect(scene.image)

    def test_cascade_per_stage_widths_length_mismatch(self):
        _fast_config()
        cf.set("cascade_n_nets", 2)
        cf.set("img_width", 24)
        cf.set("conv_filter_sizes_per_stage", [[16]])
        provider = ct.SyntheticProvider(40, 40, [12, 24], seed=9)
        with pytest.raises(ValueError, match="per_stage"):
            ct.CascadeTrainer(provider, seed=0).train()

    def test_cascade_checkpoint_roundtrip(self, tmp_path):
        _fast_config()
        cf.set("cascade_n_nets", 2)
        cf.set("img_width", 24)
        cf.set("epochs_total", 1)
        provider = ct.SyntheticProvider(40, 40, [12, 24], seed=8)
        model = ct.CascadeTrainer(provider, seed=0).train()

        from rapidobjectdetectionusingcascadedcnns_tpu.train import checkpoint

        checkpoint.save_cascade(str(tmp_path), "testsession", model)
        loaded = checkpoint.load_cascade(str(tmp_path), "testsession")
        assert loaded.n_nets == 2
        assert loaded.input_sizes == model.input_sizes
        for a, b in zip(model.stage_params, loaded.stage_params):
            np.testing.assert_allclose(
                np.asarray(a["fc1"]["W"]), b["fc1"]["W"], rtol=1e-6
            )
