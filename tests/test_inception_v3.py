"""Full-fidelity InceptionV3 trunk + torchvision weight conversion.

The jax NHWC trunk (models/inception_v3.py) is validated against an
INDEPENDENT torch.nn.functional execution of the same (random,
torchvision-layout) state dict: F.conv2d/F.batch_norm/F.max_pool2d/
F.avg_pool2d are a separate implementation of the conv-padding, BN-folding
(eps=1e-3), and pooling semantics the converter and trunk must reproduce.
Real pretrained weights drop into the same path (zero-egress here —
reference network/inception_builder.py:39-65 downloads them)."""

import numpy as np
import pytest

from rapidobjectdetectionusingcascadedcnns_tpu.models import inception, inception_v3


def _torch_forward(sd, x_nhwc):
    """Independent torch executor of the torchvision InceptionV3 trunk."""
    import torch
    import torch.nn.functional as F

    t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    x = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2))).float()

    def bconv(name, x, stride=1, padding=0):
        x = F.conv2d(x, t[name + ".conv.weight"], None, stride=stride, padding=padding)
        x = F.batch_norm(
            x,
            t[name + ".bn.running_mean"],
            t[name + ".bn.running_var"],
            t[name + ".bn.weight"],
            t[name + ".bn.bias"],
            training=False,
            eps=1e-3,
        )
        return F.relu(x)

    def avgp(x):
        return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=True)

    def block_a(p, x):
        b1 = bconv(p + ".branch1x1", x)
        b5 = bconv(p + ".branch5x5_2", bconv(p + ".branch5x5_1", x), padding=2)
        bd = bconv(p + ".branch3x3dbl_1", x)
        bd = bconv(p + ".branch3x3dbl_2", bd, padding=1)
        bd = bconv(p + ".branch3x3dbl_3", bd, padding=1)
        bp = bconv(p + ".branch_pool", avgp(x))
        return torch.cat([b1, b5, bd, bp], 1)

    def block_b(p, x):
        b3 = bconv(p + ".branch3x3", x, stride=2)
        bd = bconv(p + ".branch3x3dbl_1", x)
        bd = bconv(p + ".branch3x3dbl_2", bd, padding=1)
        bd = bconv(p + ".branch3x3dbl_3", bd, stride=2)
        return torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], 1)

    def block_c(p, x):
        b1 = bconv(p + ".branch1x1", x)
        b7 = bconv(p + ".branch7x7_1", x)
        b7 = bconv(p + ".branch7x7_2", b7, padding=(0, 3))
        b7 = bconv(p + ".branch7x7_3", b7, padding=(3, 0))
        bd = bconv(p + ".branch7x7dbl_1", x)
        bd = bconv(p + ".branch7x7dbl_2", bd, padding=(3, 0))
        bd = bconv(p + ".branch7x7dbl_3", bd, padding=(0, 3))
        bd = bconv(p + ".branch7x7dbl_4", bd, padding=(3, 0))
        bd = bconv(p + ".branch7x7dbl_5", bd, padding=(0, 3))
        bp = bconv(p + ".branch_pool", avgp(x))
        return torch.cat([b1, b7, bd, bp], 1)

    def block_d(p, x):
        b3 = bconv(p + ".branch3x3_2", bconv(p + ".branch3x3_1", x), stride=2)
        b7 = bconv(p + ".branch7x7x3_1", x)
        b7 = bconv(p + ".branch7x7x3_2", b7, padding=(0, 3))
        b7 = bconv(p + ".branch7x7x3_3", b7, padding=(3, 0))
        b7 = bconv(p + ".branch7x7x3_4", b7, stride=2)
        return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)

    def block_e(p, x):
        b1 = bconv(p + ".branch1x1", x)
        b3 = bconv(p + ".branch3x3_1", x)
        b3 = torch.cat(
            [
                bconv(p + ".branch3x3_2a", b3, padding=(0, 1)),
                bconv(p + ".branch3x3_2b", b3, padding=(1, 0)),
            ],
            1,
        )
        bd = bconv(p + ".branch3x3dbl_1", x)
        bd = bconv(p + ".branch3x3dbl_2", bd, padding=1)
        bd = torch.cat(
            [
                bconv(p + ".branch3x3dbl_3a", bd, padding=(0, 1)),
                bconv(p + ".branch3x3dbl_3b", bd, padding=(1, 0)),
            ],
            1,
        )
        bp = bconv(p + ".branch_pool", avgp(x))
        return torch.cat([b1, b3, bd, bp], 1)

    with torch.no_grad():
        h = bconv("Conv2d_1a_3x3", x, stride=2)
        h = bconv("Conv2d_2a_3x3", h)
        h = bconv("Conv2d_2b_3x3", h, padding=1)
        h = F.max_pool2d(h, 3, 2)
        h = bconv("Conv2d_3b_1x1", h)
        h = bconv("Conv2d_4a_3x3", h)
        h = F.max_pool2d(h, 3, 2)
        h = block_a("Mixed_5b", h)
        h = block_a("Mixed_5c", h)
        h = block_a("Mixed_5d", h)
        h = block_b("Mixed_6a", h)
        h = block_c("Mixed_6b", h)
        h = block_c("Mixed_6c", h)
        h = block_c("Mixed_6d", h)
        h = block_c("Mixed_6e", h)
        h = block_d("Mixed_7a", h)
        h = block_e("Mixed_7b", h)
        h = block_e("Mixed_7c", h)
        out = h.mean(dim=(2, 3))
    return out.numpy()


def test_converter_rejects_bad_shapes():
    sd = inception_v3.random_state_dict(seed=1)
    sd["Conv2d_1a_3x3.conv.weight"] = np.zeros((32, 3, 5, 5), np.float32)
    with pytest.raises(ValueError):
        inception_v3.convert_torchvision_state_dict(sd)


def test_converter_rejects_unknown_modules():
    sd = inception_v3.random_state_dict(seed=1)
    sd["Mystery_8a.conv.weight"] = np.zeros((1,), np.float32)
    with pytest.raises(ValueError):
        inception_v3.convert_torchvision_state_dict(sd)


def test_trunk_matches_independent_torch_execution(rng):
    """Converted+folded jax trunk == torch functional execution of the raw
    state dict (BN unfolded), through every block family."""
    sd = inception_v3.random_state_dict(seed=0)
    params = inception_v3.convert_torchvision_state_dict(sd)
    x = rng.rand(1, 127, 127, 3).astype(np.float32) * 2 - 1

    import jax.numpy as jnp

    ours = np.asarray(inception_v3.apply_v3(params, jnp.asarray(x), dtype=jnp.float32))
    ref = _torch_forward(sd, x)
    assert ours.shape == (1, 2048)
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


def test_contract_299_to_2048_and_npz_roundtrip(tmp_path, rng):
    """The reference's 299 -> 2048 pool_3 contract
    (network/inception_builder.py:20-24), through the npz round-trip and
    the inception.load_backbone_weights dispatch."""
    sd = inception_v3.random_state_dict(seed=2)
    params = inception_v3.convert_torchvision_state_dict(sd)
    path = str(tmp_path / "v3.npz")
    inception_v3.save_npz(path, params)
    loaded = inception.load_backbone_weights(path)
    assert "v3" in loaded

    import jax.numpy as jnp

    x = rng.rand(1, 299, 299, 3).astype(np.float32)
    out = np.asarray(inception.apply_backbone(loaded, jnp.asarray(x), dtype=jnp.float32))
    assert out.shape == (1, inception_v3.BOTTLENECK_TENSOR_SIZE)
    assert np.isfinite(out).all()
    # trunk parameter count sanity: the real InceptionV3 trunk is ~21.8M
    # parameters (fc/aux excluded) — catches dropped/extra convs in the table
    assert 21_000_000 < inception_v3.n_params(params) < 22_500_000
