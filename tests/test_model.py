"""Stage CNN architecture/shape/loss invariants."""

import jax
import jax.numpy as jnp
import numpy as np

from rapidobjectdetectionusingcascadedcnns_tpu.models import cnn
from rapidobjectdetectionusingcascadedcnns_tpu.train import losses, metrics


def _stage(size=12, bneck=None, fc1=64, filters=(8,)):
    return cnn.StageConfig(
        input_size=size,
        conv_filter_sizes=filters,
        fc1_size=fc1,
        bottleneck_in_size=bneck,
        compute_dtype=jnp.float32,
    )


def test_forward_shapes():
    cfg = _stage()
    params = cnn.init_stage(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((5, 12, 12, 3))
    out = cnn.apply_stage(params, cfg, x)
    assert out["logits"].shape == (5, 2)
    assert out["probs"].shape == (5, 2)
    assert out["bottleneck"].shape == (5, 64)
    np.testing.assert_allclose(np.asarray(out["probs"]).sum(axis=1), 1.0, rtol=1e-5)


def test_bottleneck_chaining_shapes():
    cfg0 = _stage(12)
    cfg1 = _stage(24, bneck=cfg0.bottleneck_out_size)
    cfg2 = _stage(48, bneck=cfg1.bottleneck_out_size)
    assert cfg0.bottleneck_out_size == 64
    assert cfg1.bottleneck_out_size == 128  # own fc1 + incoming
    assert cfg2.bottleneck_out_size == 192
    p1 = cnn.init_stage(jax.random.PRNGKey(1), cfg1)
    out = cnn.apply_stage(p1, cfg1, jnp.zeros((3, 24, 24, 3)), jnp.ones((3, 64)))
    assert out["bottleneck"].shape == (3, 128)
    # incoming bottleneck is passed through the concat untouched
    np.testing.assert_allclose(np.asarray(out["bottleneck"][:, 64:]), 1.0)


def test_stage_input_sizes_halving_rule():
    # app/train_cascade_app.py:203-228: 48 with 3 nets -> 12, 24, 48
    assert cnn.stage_input_sizes(3, 48) == [12, 24, 48]
    assert cnn.stage_input_sizes(4, 48) == [6, 12, 24, 48]
    assert cnn.stage_input_sizes(3, 48, increasing=False) == [48, 48, 48]
    # int() truncation on odd sizes
    assert cnn.stage_input_sizes(2, 25) == [12, 25]


def test_dropout_only_when_rng_given():
    cfg = _stage()
    params = cnn.init_stage(jax.random.PRNGKey(0), cfg)
    x = jnp.ones((4, 12, 12, 3))
    full = cnn.apply_stage(params, cfg, x)
    dropped = cnn.apply_stage(
        params, cfg, x, dropout_keep=0.5, dropout_rng=jax.random.PRNGKey(7)
    )
    assert not np.allclose(np.asarray(full["logits"]), np.asarray(dropped["logits"]))


class TestLosses:
    def test_soft_fbeta_perfect_prediction(self):
        labels = jnp.array([1, 1, 0, 0])
        probs = jnp.array([[0.0, 1.0], [0.0, 1.0], [1.0, 0.0], [1.0, 0.0]])
        assert float(losses.soft_fbeta_score(probs, labels, beta=1.0)) == 1.0
        assert float(losses.soft_fbeta_loss(probs, labels, beta=1.0)) == 0.0

    def test_soft_fbeta_zero_guard(self):
        labels = jnp.array([0, 0])
        probs = jnp.array([[1.0, 0.0], [1.0, 0.0]])
        # no positives anywhere -> guarded to 0, not NaN (net.py:430-442)
        val = float(losses.soft_fbeta_score(probs, labels, beta=2.0))
        assert val == 0.0

    def test_soft_fbeta_matches_dense_formula(self, rng):
        labels = jnp.asarray(rng.randint(0, 2, size=64))
        raw = rng.rand(64, 2).astype(np.float32)
        probs = jnp.asarray(raw / raw.sum(axis=1, keepdims=True))
        beta = 3.0
        y = np.asarray(labels, np.float64)
        p = np.asarray(probs, np.float64)
        tp = (p[:, 1] * y).sum()
        fp = (p[:, 1] * (1 - y)).sum()
        fn = (p[:, 0] * y).sum()
        prec = tp / (tp + fp)
        rec = tp / (tp + fn)
        expected = (1 + beta**2) * prec * rec / (beta**2 * prec + rec)
        got = float(losses.soft_fbeta_score(probs, labels, beta))
        assert abs(got - expected) < 1e-5

    def test_weighted_ce_ratio_weighting(self):
        logits = jnp.array([[2.0, -1.0], [0.5, 0.5], [1.0, 0.0], [0.0, 3.0]])
        labels = jnp.array([0, 1, 0, 1])
        # imbalanced prior: 25% positive => fg weight 3x (net_trainable.py:82-84)
        loss_bal = losses.weighted_cross_entropy(logits, labels, 0.5)
        loss_imb = losses.weighted_cross_entropy(logits, labels, 0.25)
        assert np.isfinite(float(loss_bal)) and np.isfinite(float(loss_imb))
        assert float(loss_imb) != float(loss_bal)

    def test_fc_regularization_zero_strengths(self):
        cfg = _stage()
        params = cnn.init_stage(jax.random.PRNGKey(0), cfg)
        assert float(losses.fc_regularization(params, 0.0, 0.0)) == 0.0
        assert float(losses.fc_regularization(params, 0.1, 0.0)) > 0.0


class TestMetrics:
    def test_confusion_counts(self):
        logits = jnp.array([[0.1, 0.9], [0.9, 0.1], [0.2, 0.8], [0.7, 0.3]])
        labels = jnp.array([1, 0, 0, 1])
        c = metrics.confusion_counts(logits, labels)
        assert int(c["true_positives"]) == 1
        assert int(c["true_negatives"]) == 1
        assert int(c["false_positives"]) == 1
        assert int(c["false_negatives"]) == 1

    def test_constant_prediction_guard(self):
        # equal scores never count as correct (net.py:358-361)
        logits = jnp.zeros((6, 2))
        labels = jnp.array([0, 1, 0, 1, 0, 1])
        c = metrics.confusion_counts(logits, labels)
        assert int(c["true_positives"]) == 0
        assert int(c["true_negatives"]) == 0

    def test_process_results_stable_derivation(self):
        res = metrics.process_results(
            {
                "true_positives": 8,
                "false_positives": 2,
                "true_negatives": 85,
                "false_negatives": 5,
            },
            f_beta=2.0,
        )
        assert abs(res["accuracy"] - 0.93) < 1e-9
        assert abs(res["precision"] - 0.8) < 1e-9
        assert abs(res["recall"] - 8 / 13) < 1e-9
        assert "f_2.00_score" in res
        assert res["samples_positive"] == 13

    def test_process_results_zero_guards(self):
        res = metrics.process_results(
            {
                "true_positives": 0,
                "false_positives": 0,
                "true_negatives": 10,
                "false_negatives": 0,
            }
        )
        assert res["precision"] == 0.0
        assert res["recall"] == 0.0
        assert res["f1_score"] == 0.0

    def test_criteria_registry_formats(self):
        assert metrics.get("accuracy").format(0.5) == "50.000%"
        assert metrics.get("true_positives").format(4.0) == "4"
        assert metrics.get("f_24.00_score").format(0.125) == "0.125"
