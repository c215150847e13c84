"""Inception-backbone stage (the append_inception option)."""

import jax
import jax.numpy as jnp
import numpy as np

from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
from rapidobjectdetectionusingcascadedcnns_tpu.models import cnn, inception
from rapidobjectdetectionusingcascadedcnns_tpu.train import checkpoint


def _inception_cfg(bneck=None):
    return cnn.StageConfig(
        input_size=inception.MODEL_INPUT_WIDTH,
        backbone="inception",
        bottleneck_in_size=bneck,
        compute_dtype=jnp.float32,
    )


def test_backbone_contract():
    """299px input, 2048-d bottleneck (inception_builder.py:20-24)."""
    params = inception.init_backbone(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 299, 299, 3))
    out = inception.apply_backbone(params, x, dtype=jnp.float32)
    assert out.shape == (2, 2048)


def test_stage_with_bottleneck_concat():
    cfg = _inception_cfg(bneck=32)
    assert cfg.bottleneck_out_size == 2048 + 32
    params = cnn.init_stage(jax.random.PRNGKey(0), cfg)
    out = cnn.apply_stage(params, cfg, jnp.zeros((2, 299, 299, 3)), jnp.ones((2, 32)))
    assert out["logits"].shape == (2, 2)
    assert out["bottleneck"].shape == (2, 2080)


def test_checkpoint_roundtrip(tmp_path):
    cfg = _inception_cfg()
    params = cnn.init_stage(jax.random.PRNGKey(1), cfg)
    mean = np.zeros((299, 299, 3), np.float32)
    std = np.ones((299, 299, 3), np.float32)
    path = str(tmp_path / "inception_stage")
    checkpoint.save_stage(path, params, cfg, mean, std)
    loaded, cfg2, _, _, _ = checkpoint.load_stage(path)
    assert cfg2.backbone == "inception"
    x = jnp.asarray(np.random.RandomState(0).rand(2, 299, 299, 3), jnp.float32)
    a = cnn.apply_stage(params, cfg, x)["logits"]
    b = cnn.apply_stage(
        jax.tree_util.tree_map(jnp.asarray, loaded), cfg2, x
    )["logits"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_backbone_weights_loading(tmp_path):
    params = inception.init_backbone(jax.random.PRNGKey(2))
    flat = checkpoint._flatten(params)
    path = str(tmp_path / "backbone.npz")
    np.savez(path, **flat)
    loaded = inception.load_backbone_weights(path)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(loaded)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cascade_sizes_with_append_inception():
    from rapidobjectdetectionusingcascadedcnns_tpu.train.cascade_trainer import (
        CascadeTrainer,
        SyntheticProvider,
    )

    cf.set("append_inception", True)
    cf.set("cascade_n_nets", 2)
    cf.set("img_width", 24)
    trainer = CascadeTrainer(SyntheticProvider(4, 4, [12, 24], seed=0))
    assert trainer.n_nets == 3
    assert trainer.sizes == [12, 24, 299]


def test_frozen_trunk_trains_head_on_embeddings(tmp_path):
    """The compact-trunk flavor of the frozen pretrained workflow: with
    inception_weights_path set, the trainer embeds every split ONCE through
    the trunk (splits become (N, 2048) float32), trains only the head
    (trunk leaves bit-identical after training), and force-disables online
    augmentation for the stage."""
    import numpy as np

    from rapidobjectdetectionusingcascadedcnns_tpu.train import checkpoint
    from rapidobjectdetectionusingcascadedcnns_tpu.train.cascade_trainer import (
        SyntheticProvider,
    )
    from rapidobjectdetectionusingcascadedcnns_tpu.train.trainer import (
        SingleNetTrainer,
    )

    backbone = inception.init_backbone(jax.random.PRNGKey(7))
    path = str(tmp_path / "trunk.npz")
    np.savez(path, **checkpoint._flatten(backbone))

    cf.set("inception_weights_path", path)
    cf.set("epochs_total", 1)
    cf.set("batch_size", 8)
    cf.set("n_max_constant_evals", None)
    cf.set("data_augmentation_online", True)  # must be force-disabled
    ds = SyntheticProvider(4, 8, [299], seed=1).dataset(299)
    trainer = SingleNetTrainer(ds, f_beta=None, seed=0, use_inception=True)
    assert trainer._frozen_trunk
    assert trainer.ds.train.images.ndim == 2
    assert trainer.ds.train.images.shape[1] == inception.BOTTLENECK_TENSOR_SIZE
    trainer.train()
    assert int(trainer.state.step) >= 1
    for a, b in zip(
        jax.tree_util.tree_leaves(backbone),
        jax.tree_util.tree_leaves(trainer.state.params["backbone"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # predict consumes the embedded split through apply_stage's 2D path
    res = trainer.evaluate_split(trainer.ds.test)
    total = sum(
        res[k] for k in ("true_positives", "false_positives",
                         "true_negatives", "false_negatives")
    )
    assert total == trainer.ds.test.n_samples
