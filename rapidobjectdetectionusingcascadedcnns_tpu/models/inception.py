"""Inception-style backbone stage (the ``append_inception`` option).

The reference can append one extra cascade stage built on the pretrained
Inception-2015 graph: it downloads the frozen GraphDef, grafts it via
``input_map`` and taps the 2048-wide ``pool_3`` bottleneck
(network/inception_builder.py:28-96); only the classifier head on top is
trainable. Constants: 299x299 input, 2048-d bottleneck
(inception_builder.py:20-24).

This environment is zero-egress, so the pretrained download is replaced by:
  * a compact inception-style trunk (factorized stem + mixed 1x1/3x3/5x5/pool
    branches + global average pool + projection to 2048) trained like any
    other stage, and
  * optional loading of externally provided backbone weights from
    ``cf.get("inception_weights_path")`` (an .npz of this module's pytree) to
    reproduce the frozen-pretrained workflow where weights are available.

The backbone keeps the reference's interface contract exactly: 299px input,
2048-d bottleneck consumed by the standard fc2 head and by the next-stage
bottleneck concat.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MODEL_INPUT_WIDTH = 299
MODEL_INPUT_HEIGHT = 299
BOTTLENECK_TENSOR_SIZE = 2048

Params = Dict[str, Any]

# (branch_1x1, branch_3x3, branch_5x5, branch_pool) output channels per block
_BLOCKS: Tuple[Tuple[int, int, int, int], ...] = (
    (32, 48, 16, 16),
    (64, 96, 32, 32),
    (96, 128, 48, 48),
)
_STEM = ((32, 3, 2), (48, 3, 2), (64, 3, 2))  # (channels, kernel, stride)


def _glorot(key, shape, fan_in, fan_out):
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -limit, limit)


def _conv_init(key, k, cin, cout):
    return {
        "W": _glorot(key, (k, k, cin, cout), k * k * cin, k * k * cout),
        "b": jnp.zeros((cout,), jnp.float32),
    }


def init_backbone(key: jax.Array) -> Params:
    params: Params = {"stem": [], "blocks": [], "proj": {}}
    cin = 3
    for cout, k, _stride in _STEM:
        key, sub = jax.random.split(key)
        params["stem"].append(_conv_init(sub, k, cin, cout))
        cin = cout
    for b1, b3, b5, bp in _BLOCKS:
        key, k1, k3a, k3b, k5a, k5b, kp = jax.random.split(key, 7)
        block = {
            "b1": _conv_init(k1, 1, cin, b1),
            "b3_reduce": _conv_init(k3a, 1, cin, b3 // 2),
            "b3": _conv_init(k3b, 3, b3 // 2, b3),
            "b5_reduce": _conv_init(k5a, 1, cin, b5 // 2),
            "b5": _conv_init(k5b, 5, b5 // 2, b5),
            "bp": _conv_init(kp, 1, cin, bp),
        }
        params["blocks"].append(block)
        cin = b1 + b3 + b5 + bp
    key, sub = jax.random.split(key)
    params["proj"] = {
        "W": _glorot(sub, (cin, BOTTLENECK_TENSOR_SIZE), cin, BOTTLENECK_TENSOR_SIZE),
        "b": jnp.zeros((BOTTLENECK_TENSOR_SIZE,), jnp.float32),
    }
    return params


def _conv(x, p, stride=1, dtype=jnp.bfloat16):
    out = jax.lax.conv_general_dilated(
        x.astype(dtype),
        p["W"].astype(dtype),
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(out + p["b"].astype(dtype))


def apply_backbone(params: Params, x: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """(N, 299, 299, 3) standardized input -> (N, 2048) bottleneck.

    Dispatches to the full-fidelity InceptionV3 trunk when ``params`` came
    from converted pretrained weights (models/inception_v3.py), else runs
    the compact trainable trunk."""
    if "v3" in params:
        from . import inception_v3

        return inception_v3.apply_v3(params["v3"], x, dtype=dtype)
    h = x.astype(dtype)
    for p, (_c, _k, stride) in zip(params["stem"], _STEM):
        h = _conv(h, p, stride=stride, dtype=dtype)
    h = jax.lax.reduce_window(
        h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "SAME"
    )
    for block in params["blocks"]:
        b1 = _conv(h, block["b1"], dtype=dtype)
        b3 = _conv(_conv(h, block["b3_reduce"], dtype=dtype), block["b3"], dtype=dtype)
        b5 = _conv(_conv(h, block["b5_reduce"], dtype=dtype), block["b5"], dtype=dtype)
        bp = _conv(
            jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1), "SAME"
            ),
            block["bp"],
            dtype=dtype,
        )
        h = jnp.concatenate([b1, b3, b5, bp], axis=-1)
        h = jax.lax.reduce_window(
            h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "SAME"
        )
    pooled = jnp.mean(h, axis=(1, 2))  # global average pool (the pool_3 analog)
    out = (
        jnp.dot(pooled.astype(dtype), params["proj"]["W"].astype(dtype)).astype(
            jnp.float32
        )
        + params["proj"]["b"]
    )
    return jax.nn.relu(out)


def params_from_flat(flat: Dict[str, np.ndarray]) -> Params:
    """Rebuild the backbone pytree from path-flattened leaves."""
    params: Params = {"stem": [], "blocks": [], "proj": {}}
    for i in range(len(_STEM)):
        params["stem"].append({"W": flat[f"stem/{i}/W"], "b": flat[f"stem/{i}/b"]})
    for i in range(len(_BLOCKS)):
        block = {}
        for name in ("b1", "b3_reduce", "b3", "b5_reduce", "b5", "bp"):
            block[name] = {
                "W": flat[f"blocks/{i}/{name}/W"],
                "b": flat[f"blocks/{i}/{name}/b"],
            }
        params["blocks"].append(block)
    params["proj"] = {"W": flat["proj/W"], "b": flat["proj/b"]}
    return params


def load_backbone_weights(path: str) -> Params:
    """Load externally provided backbone weights: either an .npz of the
    compact trunk's pytree, or a converted pretrained InceptionV3 archive
    ("v3/" namespace — tools/convert_inception.py), which routes
    apply_backbone to the full-fidelity trunk."""
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    if any(k.startswith("v3/") for k in flat):
        from . import inception_v3

        return {"v3": inception_v3.params_from_flat(flat)}
    return params_from_flat(flat)
