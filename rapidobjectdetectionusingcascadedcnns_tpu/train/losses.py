"""Training losses.

Parity targets:
  * weighted / unweighted cross entropy with the unbalanced-data ratio
    weighting (network/net_trainable.py:66-100);
  * the differentiable soft-count F-beta loss: probabilistic TP/FP/FN from
    softmax foreground probabilities, guarded divisions, loss = 1 - F_beta
    (network/net.py:418-442, net_trainable.py:102-107);
  * optional L2/L1 regularization on the fully-connected weights only
    (net_trainable.py:109-124).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


def weighted_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    positive_proportion: float,
    *,
    weighted: bool = True,
    normalize: bool = False,
    valid_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Sparse softmax cross entropy, optionally class-weighted.

    ``positive_proportion``: fraction of foreground samples in the training
    distribution (data/datasets.py:662-671). With ``weighted`` the foreground
    loss is scaled to the level of the imbalance (net_trainable.py:73-94);
    ``normalize`` makes the two weights sum to 1 (net_trainable.py:75-80).
    ``valid_mask`` excludes padding rows (batches padded to mesh-divisible
    sizes for data-parallel training) from both numerator and denominator.
    """
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, labels[:, None].astype(jnp.int32), axis=1)[
        :, 0
    ]
    if not weighted:
        if valid_mask is None:
            return jnp.mean(nll)
        m = valid_mask.astype(jnp.float32)
        return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)

    p = positive_proportion
    if normalize:
        fg_w = 1.0 - p
        bg_w = p
    else:
        bg_w = 1.0
        fg_w = (1.0 - p) / p
    y = labels.astype(jnp.float32)
    weights = y * (fg_w - bg_w) + bg_w
    if valid_mask is not None:
        weights = weights * valid_mask.astype(jnp.float32)
    # tf.losses.sparse_softmax_cross_entropy reduces by SUM_BY_NONZERO_WEIGHTS:
    # sum(w * nll) / count(w != 0)
    nonzero = jnp.sum((weights != 0).astype(jnp.float32))
    return jnp.sum(weights * nll) / jnp.maximum(nonzero, 1.0)


def soft_fbeta_score(
    probs: jnp.ndarray,
    labels: jnp.ndarray,
    beta: float,
    valid_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Differentiable F-beta from soft counts (network/net.py:418-442).

    ``probs``: (N, 2) softmax outputs; ``labels``: (N,) int {0, 1}.
    All divisions are guarded to 0 exactly like the tf.cond guards.
    ``valid_mask`` zeroes the soft-count contribution of padding rows.
    """
    y = labels.astype(jnp.float32)
    p_fg = probs[:, 1]
    p_bg = probs[:, 0]
    if valid_mask is not None:
        m = valid_mask.astype(jnp.float32)
        p_fg = p_fg * m
        p_bg = p_bg * m
    tp = jnp.sum(p_fg * y)
    fp = jnp.sum(p_fg * (1.0 - y))
    fn = jnp.sum(p_bg * y)

    beta_sq = beta * beta
    precision = jnp.where(tp + fp > 0, tp / jnp.maximum(tp + fp, 1e-30), 0.0)
    recall = jnp.where(tp + fn > 0, tp / jnp.maximum(tp + fn, 1e-30), 0.0)
    denom = beta_sq * precision + recall
    return jnp.where(
        denom > 0,
        (1.0 + beta_sq) * precision * recall / jnp.maximum(denom, 1e-30),
        0.0,
    )


def soft_fbeta_loss(
    probs: jnp.ndarray,
    labels: jnp.ndarray,
    beta: float,
    valid_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Loss = 1 - soft F-beta (net_trainable.py:102-107)."""
    return 1.0 - soft_fbeta_score(probs, labels, beta, valid_mask)


def fc_regularization(
    params: Dict[str, Any], l2_strength: float = 0.0, l1_strength: float = 0.0
) -> jnp.ndarray:
    """L2/L1 penalties on fc1/fc2 weights and biases (net_trainable.py:109-124)."""
    reg = jnp.float32(0.0)
    leaves = [params["fc2"]["W"], params["fc2"]["b"]]
    if "fc1" in params:  # inception-backbone stages have no fc1
        leaves += [params["fc1"]["W"], params["fc1"]["b"]]
    if l2_strength > 0:
        reg = reg + l2_strength * sum(0.5 * jnp.sum(w * w) for w in leaves)
    if l1_strength > 0:
        reg = reg + l1_strength * sum(jnp.sum(jnp.abs(w)) for w in leaves)
    return reg


def total_loss(
    outputs: Dict[str, jnp.ndarray],
    labels: jnp.ndarray,
    params: Dict[str, Any],
    *,
    f_beta: Optional[float],
    positive_proportion: float,
    weighted: bool = True,
    normalize: bool = False,
    l2_strength: float = 0.0,
    l1_strength: float = 0.0,
    valid_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full training loss matching NetTrainable._set_up_architecture_training
    (net_trainable.py:57-124): soft F-beta when ``f_beta`` is set, otherwise
    (weighted) cross entropy; plus FC regularizers. ``valid_mask`` excludes
    mesh-padding rows."""
    if f_beta is not None:
        loss = soft_fbeta_loss(outputs["probs"], labels, f_beta, valid_mask)
    else:
        loss = weighted_cross_entropy(
            outputs["logits"],
            labels,
            positive_proportion,
            weighted=weighted,
            normalize=normalize,
            valid_mask=valid_mask,
        )
    if l2_strength > 0 or l1_strength > 0:
        loss = loss + fc_regularization(params, l2_strength, l1_strength)
    return loss
