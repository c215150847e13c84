"""Jitted train/eval/predict steps, sharded over the device mesh.

TPU-first redesign of the reference's per-batch ``session.run`` calls
(network/net_trainable.py:221, net.py:282-332,607-652):

  * batches cross the host->device boundary as **uint8** (4x less transfer
    bandwidth than the reference's host-side float32 standardization,
    net.py:334-343); standardization, augmentation, forward, loss, backward
    and the optimizer update are ONE fused XLA program;
  * data parallelism: inputs carry a batch-axis NamedSharding, parameters are
    replicated, and XLA inserts the gradient all-reduce over ICI —
    the "collectives" component the reference lacks (SURVEY.md §2.6);
  * evaluation returns confusion-count sums; cross-batch (and cross-chip)
    accumulation is a plain sum, replacing the Python accumulator loop.

All step factories return plain jitted callables so they compose with any
mesh (or none: on a single device the shardings are no-ops).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..models import cnn
from ..ops import augment as augment_ops
from . import losses, metrics


@dataclass
class TrainState:
    params: cnn.Params
    opt_state: Any
    step: jnp.ndarray  # scalar int32

    def tree_flatten(self):  # pragma: no cover - pytree plumbing
        return (self.params, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):  # pragma: no cover
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


@dataclass(frozen=True)
class LossSettings:
    """Static loss configuration (hashable for jit)."""

    f_beta: Optional[float]
    positive_proportion: float
    weighted: bool
    normalize: bool
    l2_strength: float
    l1_strength: float
    dropout_keep: float


def init_train_state(
    key: jax.Array, cfg: cnn.StageConfig, optimizer: optax.GradientTransformation
) -> TrainState:
    params = cnn.init_stage(key, cfg)
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    cfg: cnn.StageConfig,
    optimizer: optax.GradientTransformation,
    loss_settings: LossSettings,
    augment_config: Optional[augment_ops.AugmentConfig] = None,
) -> Callable:
    """Build the fused jitted train step.

    Signature: ``step(state, images_u8, labels, bottlenecks, mean, std, rng,
    valid_mask=None) -> (state, loss)``. ``bottlenecks`` may be a dummy array
    when the stage has no bottleneck input (static in cfg). ``valid_mask``
    (None or (N,) bool) excludes padding rows so data-parallel batches can be
    padded to mesh-divisible sizes without perturbing the loss/gradients.
    """

    def loss_fn(params, images_f32, labels, bottlenecks, rng, valid_mask):
        aug_key, drop_key = jax.random.split(rng)
        x = images_f32
        if augment_config is not None:
            x = augment_ops.augment_batch(aug_key, x, labels, augment_config)
        bneck = bottlenecks if cfg.bottleneck_in_size is not None else None
        out = cnn.apply_stage(
            params,
            cfg,
            x,
            bneck,
            dropout_keep=loss_settings.dropout_keep,
            dropout_rng=drop_key,
        )
        loss = losses.total_loss(
            out,
            labels,
            params,
            f_beta=loss_settings.f_beta,
            positive_proportion=loss_settings.positive_proportion,
            weighted=loss_settings.weighted,
            normalize=loss_settings.normalize,
            l2_strength=loss_settings.l2_strength,
            l1_strength=loss_settings.l1_strength,
            valid_mask=valid_mask,
        )
        return loss

    @jax.jit
    def step(
        state: TrainState, images_u8, labels, bottlenecks, mean, std, rng,
        valid_mask=None,
    ):
        x = (images_u8.astype(jnp.float32) - mean) / std
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, x, labels, bottlenecks, rng, valid_mask
        )
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, new_opt_state, state.step + 1),
            loss,
        )

    return step


def make_eval_step(cfg: cnn.StageConfig, f_beta: Optional[float] = None) -> Callable:
    """Jitted full-metric evaluation over one (padded) batch.

    Signature: ``eval(params, images_u8, labels, bottlenecks, mean, std,
    valid_mask) -> dict of count sums``. ``valid_mask`` excludes padding rows
    so batches can be padded to mesh-divisible sizes.
    """

    @jax.jit
    def eval_step(params, images_u8, labels, bottlenecks, mean, std, valid_mask):
        x = (images_u8.astype(jnp.float32) - mean) / std
        bneck = bottlenecks if cfg.bottleneck_in_size is not None else None
        out = cnn.apply_stage(params, cfg, x, bneck)
        counts = metrics.confusion_counts(out["logits"], labels, valid_mask)
        if f_beta is not None:
            counts.update(
                metrics.soft_confusion_counts(out["probs"], labels, valid_mask)
            )
        return counts

    return eval_step


def make_predict_step(cfg: cnn.StageConfig) -> Callable:
    """Jitted prediction: returns (argmax labels, softmax probs, bottleneck).

    The bottleneck output is the post-concat fc1 tensor recorded per sample
    for the next cascade stage (net.py:572-652 ``predict`` with
    ``update_bottlenecks``).
    """

    @jax.jit
    def predict_step(params, images_u8, labels_dummy, bottlenecks, mean, std):
        x = (images_u8.astype(jnp.float32) - mean) / std
        bneck = bottlenecks if cfg.bottleneck_in_size is not None else None
        out = cnn.apply_stage(params, cfg, x, bneck)
        best = jnp.argmax(out["logits"], axis=1).astype(jnp.int32)
        return best, out["probs"], out["bottleneck"]

    return predict_step
