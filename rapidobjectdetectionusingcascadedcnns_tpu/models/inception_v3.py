"""Full-fidelity InceptionV3 trunk + pretrained-weight conversion.

The reference's ``append_inception`` grafts the pretrained Inception-2015
GraphDef and taps the 2048-wide ``pool_3`` bottleneck
(network/inception_builder.py:28-96). This environment is zero-egress, so
models/inception.py ships a compact trainable trunk; THIS module is the
other half of the parity story: when a user has real pretrained InceptionV3
weights on disk (the torchvision ``inception_v3`` state-dict layout — the
most widely mirrored offline format), :func:`convert_torchvision_state_dict`
folds the batch norms and produces a jax parameter pytree for
:func:`apply_v3`, a faithful NHWC re-implementation of the torchvision
trunk (Conv2d_1a..4a stem, Mixed_5b..7c blocks, global average pool) whose
output is the 299x299 -> 2048 bottleneck contract of the reference
(inception_builder.py:20-24).

TPU-first notes: batch norms are folded into conv weights at conversion
time (inference trunk is frozen in the reference workflow — only the head
trains, network/inception_builder.py:66-96), all convs run in bfloat16 on
the MXU with f32 accumulation, and the whole trunk is a single jittable
function.

Conversion fidelity is tested against an independent torch.nn.functional
execution of the same state dict (tests/test_inception_v3.py): conv
padding semantics, BN folding math (eps=1e-3), pooling flavors
(max / count-include-pad average), and the channel-concat order.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

BOTTLENECK_TENSOR_SIZE = 2048
BN_EPS = 1e-3  # torchvision BatchNorm2d(eps=0.001)

Params = Dict[str, Any]

# conv channel table: torchvision module path -> (cin, cout, (kh, kw))
# (architecture constants of InceptionV3; stride/padding live in the forward)
V3_CONVS: Dict[str, tuple] = {
    "Conv2d_1a_3x3": (3, 32, (3, 3)),
    "Conv2d_2a_3x3": (32, 32, (3, 3)),
    "Conv2d_2b_3x3": (32, 64, (3, 3)),
    "Conv2d_3b_1x1": (64, 80, (1, 1)),
    "Conv2d_4a_3x3": (80, 192, (3, 3)),
}


def _inception_a(prefix: str, cin: int, pool_features: int) -> Dict[str, tuple]:
    return {
        f"{prefix}.branch1x1": (cin, 64, (1, 1)),
        f"{prefix}.branch5x5_1": (cin, 48, (1, 1)),
        f"{prefix}.branch5x5_2": (48, 64, (5, 5)),
        f"{prefix}.branch3x3dbl_1": (cin, 64, (1, 1)),
        f"{prefix}.branch3x3dbl_2": (64, 96, (3, 3)),
        f"{prefix}.branch3x3dbl_3": (96, 96, (3, 3)),
        f"{prefix}.branch_pool": (cin, pool_features, (1, 1)),
    }


def _inception_b(prefix: str, cin: int) -> Dict[str, tuple]:
    return {
        f"{prefix}.branch3x3": (cin, 384, (3, 3)),
        f"{prefix}.branch3x3dbl_1": (cin, 64, (1, 1)),
        f"{prefix}.branch3x3dbl_2": (64, 96, (3, 3)),
        f"{prefix}.branch3x3dbl_3": (96, 96, (3, 3)),
    }


def _inception_c(prefix: str, cin: int, c7: int) -> Dict[str, tuple]:
    return {
        f"{prefix}.branch1x1": (cin, 192, (1, 1)),
        f"{prefix}.branch7x7_1": (cin, c7, (1, 1)),
        f"{prefix}.branch7x7_2": (c7, c7, (1, 7)),
        f"{prefix}.branch7x7_3": (c7, 192, (7, 1)),
        f"{prefix}.branch7x7dbl_1": (cin, c7, (1, 1)),
        f"{prefix}.branch7x7dbl_2": (c7, c7, (7, 1)),
        f"{prefix}.branch7x7dbl_3": (c7, c7, (1, 7)),
        f"{prefix}.branch7x7dbl_4": (c7, c7, (7, 1)),
        f"{prefix}.branch7x7dbl_5": (c7, 192, (1, 7)),
        f"{prefix}.branch_pool": (cin, 192, (1, 1)),
    }


def _inception_d(prefix: str, cin: int) -> Dict[str, tuple]:
    return {
        f"{prefix}.branch3x3_1": (cin, 192, (1, 1)),
        f"{prefix}.branch3x3_2": (192, 320, (3, 3)),
        f"{prefix}.branch7x7x3_1": (cin, 192, (1, 1)),
        f"{prefix}.branch7x7x3_2": (192, 192, (1, 7)),
        f"{prefix}.branch7x7x3_3": (192, 192, (7, 1)),
        f"{prefix}.branch7x7x3_4": (192, 192, (3, 3)),
    }


def _inception_e(prefix: str, cin: int) -> Dict[str, tuple]:
    return {
        f"{prefix}.branch1x1": (cin, 320, (1, 1)),
        f"{prefix}.branch3x3_1": (cin, 384, (1, 1)),
        f"{prefix}.branch3x3_2a": (384, 384, (1, 3)),
        f"{prefix}.branch3x3_2b": (384, 384, (3, 1)),
        f"{prefix}.branch3x3dbl_1": (cin, 448, (1, 1)),
        f"{prefix}.branch3x3dbl_2": (448, 384, (3, 3)),
        f"{prefix}.branch3x3dbl_3a": (384, 384, (1, 3)),
        f"{prefix}.branch3x3dbl_3b": (384, 384, (3, 1)),
        f"{prefix}.branch_pool": (cin, 192, (1, 1)),
    }


def conv_table() -> Dict[str, tuple]:
    """Every trunk conv of torchvision InceptionV3: path -> (cin, cout, k)."""
    table = dict(V3_CONVS)
    table.update(_inception_a("Mixed_5b", 192, 32))
    table.update(_inception_a("Mixed_5c", 256, 64))
    table.update(_inception_a("Mixed_5d", 288, 64))
    table.update(_inception_b("Mixed_6a", 288))
    table.update(_inception_c("Mixed_6b", 768, 128))
    table.update(_inception_c("Mixed_6c", 768, 160))
    table.update(_inception_c("Mixed_6d", 768, 160))
    table.update(_inception_c("Mixed_6e", 768, 192))
    table.update(_inception_d("Mixed_7a", 768))
    table.update(_inception_e("Mixed_7b", 1280))
    table.update(_inception_e("Mixed_7c", 2048))
    return table


# --------------------------------------------------------------------------
# conversion (torchvision state dict -> folded NHWC pytree)
# --------------------------------------------------------------------------


def convert_torchvision_state_dict(state_dict: Dict[str, np.ndarray]) -> Params:
    """Fold each BasicConv2d (conv bias=False + BN eps=1e-3 + relu) into a
    single conv with bias, transposing OIHW -> HWIO.

    ``state_dict``: torchvision ``inception_v3`` state dict with numpy (or
    torch) tensors. ``fc.*`` / ``AuxLogits.*`` entries are ignored (the
    reference's trunk is frozen and headless — the cascade supplies its own
    fc2 head). Raises KeyError on missing trunk weights so silently-wrong
    conversions are impossible.
    """

    def arr(name):
        v = state_dict[name]
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    params: Params = {}
    for path, (cin, cout, (kh, kw)) in conv_table().items():
        w = arr(path + ".conv.weight")  # (cout, cin, kh, kw)
        if w.shape != (cout, cin, kh, kw):
            raise ValueError(
                "unexpected shape for {}: {} (want {})".format(
                    path, w.shape, (cout, cin, kh, kw)
                )
            )
        gamma = arr(path + ".bn.weight")
        beta = arr(path + ".bn.bias")
        mean = arr(path + ".bn.running_mean")
        var = arr(path + ".bn.running_var")
        scale = gamma / np.sqrt(var + BN_EPS)
        w_folded = np.transpose(w, (2, 3, 1, 0)) * scale[None, None, None, :]
        b_folded = beta - mean * scale
        params[path] = {
            "W": w_folded.astype(np.float32),
            "b": b_folded.astype(np.float32),
        }

    extra = {
        k.split(".")[0]
        for k in state_dict
        if k.split(".")[0] not in {p.split(".")[0] for p in params}
        and k.split(".")[0] not in {"fc", "AuxLogits", "dropout", "avgpool"}
    }
    if extra:
        raise ValueError("unrecognized state-dict modules: {}".format(sorted(extra)))
    return params


def random_state_dict(seed: int = 0) -> Dict[str, np.ndarray]:
    """A random torchvision-layout state dict (for conversion tests in this
    zero-egress environment; real pretrained weights drop in identically)."""
    rs = np.random.RandomState(seed)
    sd: Dict[str, np.ndarray] = {}
    for path, (cin, cout, (kh, kw)) in conv_table().items():
        sd[path + ".conv.weight"] = rs.randn(cout, cin, kh, kw).astype(np.float32) * 0.05
        sd[path + ".bn.weight"] = rs.rand(cout).astype(np.float32) + 0.5
        sd[path + ".bn.bias"] = rs.randn(cout).astype(np.float32) * 0.1
        sd[path + ".bn.running_mean"] = rs.randn(cout).astype(np.float32) * 0.1
        sd[path + ".bn.running_var"] = rs.rand(cout).astype(np.float32) + 0.5
    return sd


# --------------------------------------------------------------------------
# forward (NHWC, bf16 MXU convs, f32 boundaries)
# --------------------------------------------------------------------------


def _conv(params, path, x, stride=1, padding=(0, 0), dtype=jnp.bfloat16):
    p = params[path]
    ph, pw = padding
    out = jax.lax.conv_general_dilated(
        x.astype(dtype),
        p["W"].astype(dtype),
        window_strides=(stride, stride),
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return jax.nn.relu(out + p["b"]).astype(dtype)


def _max_pool(x, size=3, stride=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, size, size, 1), (1, stride, stride, 1), "VALID"
    )


def _avg_pool_3_1_1(x):
    """AvgPool2d(3, stride=1, padding=1) with torch's count_include_pad=True."""
    summed = jax.lax.reduce_window(
        x,
        jnp.array(0, x.dtype),
        jax.lax.add,
        (1, 3, 3, 1),
        (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return summed / jnp.array(9, x.dtype)


def _block_a(params, prefix, x, dtype):
    b1 = _conv(params, f"{prefix}.branch1x1", x, dtype=dtype)
    b5 = _conv(params, f"{prefix}.branch5x5_1", x, dtype=dtype)
    b5 = _conv(params, f"{prefix}.branch5x5_2", b5, padding=(2, 2), dtype=dtype)
    b3 = _conv(params, f"{prefix}.branch3x3dbl_1", x, dtype=dtype)
    b3 = _conv(params, f"{prefix}.branch3x3dbl_2", b3, padding=(1, 1), dtype=dtype)
    b3 = _conv(params, f"{prefix}.branch3x3dbl_3", b3, padding=(1, 1), dtype=dtype)
    bp = _conv(params, f"{prefix}.branch_pool", _avg_pool_3_1_1(x), dtype=dtype)
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _block_b(params, prefix, x, dtype):
    b3 = _conv(params, f"{prefix}.branch3x3", x, stride=2, dtype=dtype)
    bd = _conv(params, f"{prefix}.branch3x3dbl_1", x, dtype=dtype)
    bd = _conv(params, f"{prefix}.branch3x3dbl_2", bd, padding=(1, 1), dtype=dtype)
    bd = _conv(params, f"{prefix}.branch3x3dbl_3", bd, stride=2, dtype=dtype)
    return jnp.concatenate([b3, bd, _max_pool(x)], axis=-1)


def _block_c(params, prefix, x, dtype):
    b1 = _conv(params, f"{prefix}.branch1x1", x, dtype=dtype)
    b7 = _conv(params, f"{prefix}.branch7x7_1", x, dtype=dtype)
    b7 = _conv(params, f"{prefix}.branch7x7_2", b7, padding=(0, 3), dtype=dtype)
    b7 = _conv(params, f"{prefix}.branch7x7_3", b7, padding=(3, 0), dtype=dtype)
    bd = _conv(params, f"{prefix}.branch7x7dbl_1", x, dtype=dtype)
    bd = _conv(params, f"{prefix}.branch7x7dbl_2", bd, padding=(3, 0), dtype=dtype)
    bd = _conv(params, f"{prefix}.branch7x7dbl_3", bd, padding=(0, 3), dtype=dtype)
    bd = _conv(params, f"{prefix}.branch7x7dbl_4", bd, padding=(3, 0), dtype=dtype)
    bd = _conv(params, f"{prefix}.branch7x7dbl_5", bd, padding=(0, 3), dtype=dtype)
    bp = _conv(params, f"{prefix}.branch_pool", _avg_pool_3_1_1(x), dtype=dtype)
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _block_d(params, prefix, x, dtype):
    b3 = _conv(params, f"{prefix}.branch3x3_1", x, dtype=dtype)
    b3 = _conv(params, f"{prefix}.branch3x3_2", b3, stride=2, dtype=dtype)
    b7 = _conv(params, f"{prefix}.branch7x7x3_1", x, dtype=dtype)
    b7 = _conv(params, f"{prefix}.branch7x7x3_2", b7, padding=(0, 3), dtype=dtype)
    b7 = _conv(params, f"{prefix}.branch7x7x3_3", b7, padding=(3, 0), dtype=dtype)
    b7 = _conv(params, f"{prefix}.branch7x7x3_4", b7, stride=2, dtype=dtype)
    return jnp.concatenate([b3, b7, _max_pool(x)], axis=-1)


def _block_e(params, prefix, x, dtype):
    b1 = _conv(params, f"{prefix}.branch1x1", x, dtype=dtype)
    b3 = _conv(params, f"{prefix}.branch3x3_1", x, dtype=dtype)
    b3 = jnp.concatenate(
        [
            _conv(params, f"{prefix}.branch3x3_2a", b3, padding=(0, 1), dtype=dtype),
            _conv(params, f"{prefix}.branch3x3_2b", b3, padding=(1, 0), dtype=dtype),
        ],
        axis=-1,
    )
    bd = _conv(params, f"{prefix}.branch3x3dbl_1", x, dtype=dtype)
    bd = _conv(params, f"{prefix}.branch3x3dbl_2", bd, padding=(1, 1), dtype=dtype)
    bd = jnp.concatenate(
        [
            _conv(params, f"{prefix}.branch3x3dbl_3a", bd, padding=(0, 1), dtype=dtype),
            _conv(params, f"{prefix}.branch3x3dbl_3b", bd, padding=(1, 0), dtype=dtype),
        ],
        axis=-1,
    )
    bp = _conv(params, f"{prefix}.branch_pool", _avg_pool_3_1_1(x), dtype=dtype)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def apply_v3(params: Params, x: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """(N, 299, 299, 3) standardized input -> (N, 2048) pool_3 bottleneck."""
    h = x.astype(dtype)
    h = _conv(params, "Conv2d_1a_3x3", h, stride=2, dtype=dtype)
    h = _conv(params, "Conv2d_2a_3x3", h, dtype=dtype)
    h = _conv(params, "Conv2d_2b_3x3", h, padding=(1, 1), dtype=dtype)
    h = _max_pool(h)
    h = _conv(params, "Conv2d_3b_1x1", h, dtype=dtype)
    h = _conv(params, "Conv2d_4a_3x3", h, dtype=dtype)
    h = _max_pool(h)
    h = _block_a(params, "Mixed_5b", h, dtype)
    h = _block_a(params, "Mixed_5c", h, dtype)
    h = _block_a(params, "Mixed_5d", h, dtype)
    h = _block_b(params, "Mixed_6a", h, dtype)
    h = _block_c(params, "Mixed_6b", h, dtype)
    h = _block_c(params, "Mixed_6c", h, dtype)
    h = _block_c(params, "Mixed_6d", h, dtype)
    h = _block_c(params, "Mixed_6e", h, dtype)
    h = _block_d(params, "Mixed_7a", h, dtype)
    h = _block_e(params, "Mixed_7b", h, dtype)
    h = _block_e(params, "Mixed_7c", h, dtype)
    return jnp.mean(h.astype(jnp.float32), axis=(1, 2))  # adaptive avg pool -> 2048


# --------------------------------------------------------------------------
# npz round-trip (the cf["inception_weights_path"] format, "v3/" namespace)
# --------------------------------------------------------------------------


def save_npz(path: str, params: Params) -> None:
    flat = {}
    for conv_path, p in params.items():
        flat["v3/{}/W".format(conv_path)] = np.asarray(p["W"])
        flat["v3/{}/b".format(conv_path)] = np.asarray(p["b"])
    np.savez(path, **flat)


def params_from_flat(flat: Dict[str, np.ndarray]) -> Params:
    params: Params = {}
    for key, value in flat.items():
        if not key.startswith("v3/"):
            raise KeyError("not a v3 backbone archive: {}".format(key))
        _, conv_path, leaf = key.split("/")
        params.setdefault(conv_path, {})[leaf] = value
    missing = set(conv_table()) - set(params)
    if missing:
        raise KeyError("v3 archive missing convs: {}".format(sorted(missing)[:5]))
    return params


def n_params(params: Params) -> int:
    return sum(int(np.asarray(p["W"]).size) + int(np.asarray(p["b"]).size)
               for p in params.values())
