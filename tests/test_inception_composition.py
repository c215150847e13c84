"""Pretrained-Inception workflow, composed end to end (VERDICT r3 item 5).

The reference grafts the downloaded Inception-2015 graph as the cascade's
appended stage: frozen trunk, pool_3 2048-d bottleneck, trainable head
(network/inception_builder.py:28-96 + app/train_app.py:241-251 +
app/train_cascade_app.py:203-228). This test proves the TPU-native
composition of all three halves on a fixture state dict:

    torchvision-layout state dict
      -> convert_torchvision_state_dict (models/inception_v3.py)
      -> npz archive (the cf["inception_weights_path"] format)
      -> loaded as the append_inception stage's trunk (models/cnn.py)
      -> head-only training (frozen trunk, embed-once; train/trainer.py)
      -> cascade combined Pi-evaluation (train/cascade_trainer.py)

One V3 compile dominates this test's runtime (~2-3 min on the CI CPU); the
head programs are tiny.
"""

import numpy as np
import pytest

from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
from rapidobjectdetectionusingcascadedcnns_tpu.models import inception_v3
from rapidobjectdetectionusingcascadedcnns_tpu.train import cascade_trainer as ct


@pytest.fixture(autouse=True)
def _reset_config():
    cf.reset()
    yield
    cf.reset()


def test_pretrained_trunk_composes_into_cascade(tmp_path):
    # 1. fixture pretrained weights: random torchvision-layout state dict,
    #    converted and archived exactly like tools/convert_inception.py would
    sd = inception_v3.random_state_dict(seed=3)
    converted = inception_v3.convert_torchvision_state_dict(sd)
    archive = str(tmp_path / "inception_v3_fixture.npz")
    inception_v3.save_npz(archive, converted)

    # 2. one custom 12px stage + the appended 299px inception stage
    cf.set("append_inception", True)
    cf.set("inception_weights_path", archive)
    cf.set("cascade_n_nets", 1)
    cf.set("img_width", 12)
    cf.set("conv_filter_sizes", [4])
    cf.set("fc1_size", 8)
    cf.set("epochs_total", 1)
    cf.set("batch_size", 8)
    cf.set("n_max_constant_evals", None)
    # augmentation must be force-disabled on the frozen-trunk stage
    cf.set("data_augmentation_online", True)

    provider = ct.SyntheticProvider(6, 10, [12], seed=0, source="patches")
    trainer = ct.CascadeTrainer(provider, seed=0)
    model = trainer.train()

    # 3. the cascade got both stages; the appended one runs the V3 trunk
    assert model.n_nets == 2
    assert model.stage_configs[1].backbone == "inception"
    assert model.stage_configs[1].input_size == 299
    trunk = model.stage_params[1]["backbone"]
    assert "v3" in trunk, "archive did not route to the full-fidelity trunk"

    # 4. the trunk stayed FROZEN: every leaf equals the converted fixture
    for conv_path, p in converted.items():
        np.testing.assert_array_equal(
            np.asarray(trunk["v3"][conv_path]["W"]), np.asarray(p["W"]),
            err_msg=conv_path,
        )
        np.testing.assert_array_equal(
            np.asarray(trunk["v3"][conv_path]["b"]), np.asarray(p["b"]),
            err_msg=conv_path,
        )

    # 5. the head trained on embedded bottlenecks (embed-once path)
    inc_trainer = trainer.stage_trainers[-1]
    assert inc_trainer._frozen_trunk
    assert inc_trainer.ds.train.images.ndim == 2
    assert inc_trainer.ds.train.images.shape[1] == 2048
    assert int(inc_trainer.state.step) >= 1
    assert inc_trainer._last_loss is not None
    assert np.isfinite(inc_trainer._last_loss)
    # bottleneck chaining from the custom stage reached the inception head:
    # fc2 input = 2048 (pool_3 analog) + stage-0 bottleneck
    fc2_in = model.stage_params[1]["fc2"]["W"].shape[0]
    assert fc2_in == 2048 + model.stage_configs[0].bottleneck_out_size

    # 6. the cascade combined Pi-evaluation ran over both stages
    assert trainer.combined_results
    for split_name, res in trainer.combined_results.items():
        assert "accuracy" in res, (split_name, res)
