"""Cascade-stage CNN: pure init/apply over parameter pytrees.

Architecture parity with the reference net (network/net.py:101-240,
network/net_builder.py):

    X -> [conv(kxk, SAME, stride s) -> relu -> maxpool(p, SAME, stride q)]*
      -> fc1 (relu)                                    # the "bottleneck"
      -> concat(prev-stage bottleneck)  (optional)     # net.py:139-146
      -> dropout                                       # net.py:149-153
      -> fc2 (2 logits) -> softmax                     # net.py:156-165

TPU-first design notes:
  * NHWC layout, weights in HWIO; convs/matmuls run in ``compute_dtype``
    (bfloat16 by default) with float32 accumulation via
    ``preferred_element_type`` so they map onto the MXU.
  * No layer objects, no name scopes — parameters are a flat pytree
    (dict of dicts), so jit/grad/vmap/pjit compose trivially and
    checkpointing is a numpy save.
  * Xavier/Glorot-uniform init matches the reference's
    ``xavier_initializer`` (net_builder.py:38,85).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclass(frozen=True)
class StageConfig:
    """Static architecture description of one cascade stage."""

    input_size: int  # square input resolution (12 / 24 / 48)
    channels: int = 3
    conv_filter_sizes: Tuple[int, ...] = (32,)  # maps per conv layer
    conv_kernel: int = 3
    conv_stride: int = 1
    pooling_size: int = 3
    pooling_stride: int = 1
    fc1_size: int = 512
    n_classes: int = 2
    bottleneck_in_size: Optional[int] = None  # previous stage's fc1(+in) width
    compute_dtype: Any = jnp.bfloat16
    backbone: str = "custom"  # "custom" conv stack | "inception" trunk
    # (the reference's append_inception grafts the Inception-2015 graph as
    # the hidden architecture, network/net.py:242-248; see models/inception)

    @classmethod
    def from_config(
        cls,
        input_size: int,
        bottleneck_in_size: Optional[int] = None,
        backbone: str = "custom",
    ):
        from .. import config as cf

        dtype = jnp.bfloat16 if cf.get("compute_dtype") == "bfloat16" else jnp.float32
        return cls(
            input_size=input_size,
            conv_filter_sizes=tuple(cf.get("conv_filter_sizes")),
            conv_kernel=cf.get("conv_filter_size"),
            conv_stride=cf.get("conv_stride"),
            pooling_size=cf.get("pooling_size"),
            pooling_stride=cf.get("pooling_stride"),
            fc1_size=cf.get("fc1_size"),
            bottleneck_in_size=bottleneck_in_size,
            compute_dtype=dtype,
            backbone=backbone,
        )

    @property
    def hidden_width(self) -> int:
        """Width of the hidden ("fc1") representation before any concat."""
        if self.backbone == "inception":
            from . import inception

            return inception.BOTTLENECK_TENSOR_SIZE
        return self.fc1_size

    @property
    def bottleneck_out_size(self) -> int:
        """Width of the bottleneck this stage exposes to the next one:
        fc1 concatenated with the incoming bottleneck (net.py:139-146)."""
        return self.hidden_width + (self.bottleneck_in_size or 0)

    def conv_output_hw(self) -> int:
        """Spatial size after the conv/pool stack (SAME padding)."""
        hw = self.input_size
        for _ in self.conv_filter_sizes:
            hw = math.ceil(hw / self.conv_stride)
            hw = math.ceil(hw / self.pooling_stride)
        return hw

    def flat_features(self) -> int:
        return self.conv_output_hw() ** 2 * (
            self.conv_filter_sizes[-1] if self.conv_filter_sizes else self.channels
        )


def _glorot_uniform(key, shape, fan_in, fan_out, dtype=jnp.float32):
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)


def init_stage(key: jax.Array, cfg: StageConfig) -> Params:
    """Initialize one stage's parameter pytree (float32 master weights)."""
    if cfg.backbone == "inception":
        return _init_inception_stage(key, cfg)
    params: Params = {"conv": [], "fc1": {}, "fc2": {}}
    in_ch = cfg.channels
    for n_out in cfg.conv_filter_sizes:
        key, sub = jax.random.split(key)
        k = cfg.conv_kernel
        fan_in = k * k * in_ch
        fan_out = k * k * n_out
        params["conv"].append(
            {
                "W": _glorot_uniform(sub, (k, k, in_ch, n_out), fan_in, fan_out),
                "b": jnp.zeros((n_out,), jnp.float32),
            }
        )
        in_ch = n_out

    n_flat = cfg.flat_features()
    key, sub = jax.random.split(key)
    params["fc1"] = {
        "W": _glorot_uniform(sub, (n_flat, cfg.fc1_size), n_flat, cfg.fc1_size),
        "b": jnp.zeros((cfg.fc1_size,), jnp.float32),
    }
    fc2_in = cfg.fc1_size + (cfg.bottleneck_in_size or 0)
    key, sub = jax.random.split(key)
    params["fc2"] = {
        "W": _glorot_uniform(sub, (fc2_in, cfg.n_classes), fc2_in, cfg.n_classes),
        "b": jnp.zeros((cfg.n_classes,), jnp.float32),
    }
    return params


def _init_inception_stage(key: jax.Array, cfg: StageConfig) -> Params:
    """Inception-backbone stage: trunk + classifier head. Externally provided
    trunk weights are loaded from cf.get('inception_weights_path') when set
    (the zero-egress analog of the reference's pretrained download,
    network/inception_builder.py:39-65)."""
    from .. import config as cf_mod
    from . import inception

    key, bkey, fkey = jax.random.split(key, 3)
    weights_path = (
        cf_mod.get("inception_weights_path")
        if cf_mod.has("inception_weights_path")
        else None
    )
    if weights_path:
        backbone = jax.tree_util.tree_map(
            jnp.asarray, inception.load_backbone_weights(weights_path)
        )
    else:
        backbone = inception.init_backbone(bkey)
    fc2_in = inception.BOTTLENECK_TENSOR_SIZE + (cfg.bottleneck_in_size or 0)
    return {
        "backbone": backbone,
        "fc2": {
            "W": _glorot_uniform(fkey, (fc2_in, cfg.n_classes), fc2_in, cfg.n_classes),
            "b": jnp.zeros((cfg.n_classes,), jnp.float32),
        },
    }


def _max_pool_same(x: jnp.ndarray, size: int, stride: int) -> jnp.ndarray:
    """Max-pool with SAME padding (net_builder.py:6-17)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,  # float literal: monoid-matched to the differentiable max-pool
        jax.lax.max,
        window_dimensions=(1, size, size, 1),
        window_strides=(1, stride, stride, 1),
        padding="SAME",
    )


def apply_stage(
    params: Params,
    cfg: StageConfig,
    x: jnp.ndarray,
    bottleneck_in: Optional[jnp.ndarray] = None,
    *,
    dropout_keep: float = 1.0,
    dropout_rng: Optional[jax.Array] = None,
    precision: Optional[jax.lax.Precision] = None,
) -> Dict[str, jnp.ndarray]:
    """Forward pass.

    ``x``: (N, H, W, C) float32, already standardized.
    Returns dict with ``logits`` (N, 2), ``probs`` (N, 2 softmax),
    ``bottleneck`` (N, bottleneck_out_size) — fc1 activations concatenated
    with the incoming bottleneck, i.e. exactly the tensor the reference feeds
    to the next stage (net.py:139-146, inference_cascade_app.py:79-87).

    ``precision``: matmul/conv precision override. TPU XLA demotes float32
    matmul operands to bf16 at default precision, so strict-parity runs
    (``inference_high_precision``) pass ``Precision.HIGHEST`` here — the
    same knob the resampler honors (ops/windows.py:180-183).
    """
    cdt = cfg.compute_dtype
    if cfg.backbone == "inception":
        from . import inception

        if x.ndim == 2:
            # pre-embedded frozen-trunk features (the embed-once training
            # path, train/trainer.py): the trunk already ran, x IS the
            # 2048-d bottleneck — only the classifier head applies
            fc1 = x.astype(jnp.float32)
        else:
            fc1 = inception.apply_backbone(params["backbone"], x, dtype=cdt)
        return _head(
            params, cfg, fc1, bottleneck_in, dropout_keep, dropout_rng, precision
        )
    # uniform compute dtype through the trunk (all-bf16 convs/matmuls hit
    # the MXU at full rate and keep fwd/bwd dtypes consistent; TPU MXU
    # accumulates in float32 internally), f32 at the numerical boundaries
    h = x.astype(cdt)
    for layer in params["conv"]:
        h = jax.lax.conv_general_dilated(
            h,
            layer["W"].astype(cdt),
            window_strides=(cfg.conv_stride, cfg.conv_stride),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision,
        )
        h = h + layer["b"].astype(cdt)
        h = jax.nn.relu(h)
        h = _max_pool_same(h, cfg.pooling_size, cfg.pooling_stride)

    h = h.reshape(h.shape[0], -1)
    fc1 = (
        jnp.dot(h, params["fc1"]["W"].astype(cdt), precision=precision)
        + params["fc1"]["b"].astype(cdt)
    )
    fc1 = jax.nn.relu(fc1).astype(jnp.float32)
    return _head(
        params, cfg, fc1, bottleneck_in, dropout_keep, dropout_rng, precision
    )


def _head(params, cfg, fc1, bottleneck_in, dropout_keep, dropout_rng,
          precision=None):
    """Shared classifier head: bottleneck concat -> dropout -> fc2 -> softmax
    (net.py:139-165)."""
    cdt = cfg.compute_dtype
    if cfg.bottleneck_in_size is not None:
        if bottleneck_in is None:
            raise ValueError("stage expects a bottleneck_in tensor")
        bottleneck = jnp.concatenate(
            [fc1, bottleneck_in.astype(jnp.float32)], axis=1
        )
    else:
        bottleneck = fc1

    h2 = bottleneck
    if dropout_keep < 1.0:
        if dropout_rng is None:
            raise ValueError("dropout requires an rng key")
        # inverted dropout with keep-probability semantics (tf.nn.dropout)
        mask = jax.random.bernoulli(dropout_rng, p=dropout_keep, shape=h2.shape)
        h2 = jnp.where(mask, h2 / dropout_keep, 0.0)

    logits = (
        jnp.dot(
            h2.astype(cdt), params["fc2"]["W"].astype(cdt), precision=precision
        ).astype(jnp.float32)
        + params["fc2"]["b"]
    )
    probs = jax.nn.softmax(logits, axis=-1)
    return {"logits": logits, "probs": probs, "bottleneck": bottleneck}


def stage_input_sizes(n_nets: int, img_size_max: int, increasing: bool = True) -> list:
    """Per-stage input resolutions: the halving rule of
    ``TrainCascadeApp.update_img_dimensions`` (app/train_cascade_app.py:203-228),
    e.g. 48 with 3 nets -> [12, 24, 48]."""
    sizes = []
    for i in range(n_nets):
        size = img_size_max
        if increasing:
            for _ in range(n_nets - i - 1):
                size = int(size / 2)
        sizes.append(size)
    return sizes


def count_params(params: Params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
