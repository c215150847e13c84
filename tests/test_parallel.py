"""Mesh/sharding layer on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rapidobjectdetectionusingcascadedcnns_tpu.parallel import mesh as mesh_mod


@pytest.fixture(scope="module")
def mesh8():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    return mesh_mod.get_mesh(8)


def test_mesh_shape(mesh8):
    assert mesh8.devices.size == 8
    assert mesh8.axis_names == (mesh_mod.DATA_AXIS,)


def test_shard_batch_places_across_devices(mesh8):
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    sharded = mesh_mod.shard_batch(mesh8, x)
    assert len(sharded.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(sharded), x)


def test_replicate(mesh8):
    tree = {"w": np.ones((3, 3)), "b": np.zeros((3,))}
    rep = mesh_mod.replicate(mesh8, tree)
    assert len(rep["w"].sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(rep["w"]), tree["w"])


def test_pad_to_multiple():
    x = np.arange(10)
    padded, orig = mesh_mod.pad_to_multiple(x, 8)
    assert padded.shape[0] == 16 and orig == 10
    same, orig2 = mesh_mod.pad_to_multiple(np.arange(16), 8)
    assert same.shape[0] == 16 and orig2 == 16


def test_sharded_train_step_matches_single_device(mesh8):
    """Data-parallel gradient step == single-device step on the same batch."""
    from rapidobjectdetectionusingcascadedcnns_tpu.models import cnn
    from rapidobjectdetectionusingcascadedcnns_tpu.train import (
        optimizer as opt_mod,
        train_step,
    )
    from rapidobjectdetectionusingcascadedcnns_tpu import config as cf

    cf.set("compute_dtype", "float32")
    cf.set("optimizer", cf.OPTIMIZER_SGD)
    cf.set("learning_rate_init", 0.01)
    stage_cfg = cnn.StageConfig(
        input_size=12, conv_filter_sizes=(4,), fc1_size=16, compute_dtype=jnp.float32
    )
    optimizer = opt_mod.optimizer_from_config(100)
    state = train_step.init_train_state(jax.random.PRNGKey(0), stage_cfg, optimizer)
    settings = train_step.LossSettings(
        f_beta=None,
        positive_proportion=0.5,
        weighted=False,
        normalize=False,
        l2_strength=0.0,
        l1_strength=0.0,
        dropout_keep=1.0,
    )
    step = train_step.make_train_step(stage_cfg, optimizer, settings, None)

    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, size=(16, 12, 12, 3), dtype=np.uint8)
    labels = (np.arange(16) % 2).astype(np.int32)
    bneck = np.zeros((16, 1), np.float32)
    mean = np.full((12, 12, 3), 127.5, np.float32)
    std = np.full((12, 12, 3), 64.0, np.float32)
    key = jax.random.PRNGKey(7)

    single_state, single_loss = step(
        state, jnp.asarray(images), jnp.asarray(labels), jnp.asarray(bneck),
        jnp.asarray(mean), jnp.asarray(std), key,
    )

    imgs_s, labels_s, bneck_s = mesh_mod.shard_batch(mesh8, images, labels, bneck)
    state_r = mesh_mod.replicate(mesh8, state)
    mean_r, std_r = mesh_mod.replicate(mesh8, (mean, std))
    sharded_state, sharded_loss = step(
        state_r, imgs_s, labels_s, bneck_s, mean_r, std_r, key
    )

    assert abs(float(single_loss) - float(sharded_loss)) < 1e-5
    for a, b in zip(
        jax.tree_util.tree_leaves(single_state.params),
        jax.tree_util.tree_leaves(sharded_state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_mesh_sharded_cascade_inference(mesh8):
    """Frame-batch sharding over the mesh produces the same detections as
    single-device inference (multi-chip serving path)."""
    from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
    from rapidobjectdetectionusingcascadedcnns_tpu.data import synthetic
    from rapidobjectdetectionusingcascadedcnns_tpu.models import cascade

    cf.set("conv_filter_sizes", [8])
    cf.set("fc1_size", 32)
    cf.set("compute_dtype", "float32")
    cf.set("nms", cf.NMS_DISABLED)
    cf.set("inference_batch_frames", 8)
    model = cascade.build_cascade_model(seed=0)
    scenes = [
        synthetic.make_scene(100, 100, 1, seed=s, min_face=40, max_face=50).image
        for s in range(6)  # 6 frames force padding to the 8-device multiple
    ]
    single = cascade.CascadeDetector(model).detect_batch(scenes)
    sharded = cascade.CascadeDetector(model, mesh=mesh8).detect_batch(scenes)
    for a, b in zip(single, sharded):
        np.testing.assert_array_equal(a.raw_boxes, b.raw_boxes)
        np.testing.assert_allclose(a.raw_confidences, b.raw_confidences, rtol=1e-5)


def test_graft_dryrun_multichip():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(4)
