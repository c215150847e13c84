"""Learning-rate schedule + optimizer construction (optax).

Parity with the reference (network/net_trainable.py:127-143):
  * exponential decay, staircase, ``decay_steps = iterations_total / 20``,
    floored at ``learning_rate_min`` (= 0.1 * init, config.py:567-571);
  * SGD / Adam / Momentum selected by the ``optimizer`` config int
    (config.py:169-176), momentum falling back to plain SGD when the
    momentum coefficient is 0.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import optax

from .. import config as cf


def exponential_decay_staircase(
    init: float, decay_rate: float, decay_steps: float, floor: float
) -> Callable:
    """lr(step) = max(init * decay_rate^floor(step / decay_steps), floor)."""

    def schedule(step):
        exponent = jnp.floor(step / jnp.maximum(decay_steps, 1e-9))
        return jnp.maximum(init * decay_rate**exponent, floor)

    return schedule


def lr_schedule_from_config(iterations_total: int) -> Callable:
    return exponential_decay_staircase(
        init=cf.get("learning_rate_init"),
        decay_rate=cf.get("learning_rate_decay"),
        decay_steps=iterations_total / 20.0,
        floor=cf.get("learning_rate_min"),
    )


def optimizer_from_config(iterations_total: int) -> optax.GradientTransformation:
    schedule = lr_schedule_from_config(iterations_total)
    opt_id = cf.get("optimizer")
    if opt_id == cf.OPTIMIZER_MOMENTUM and cf.get("momentum") != 0:
        return optax.sgd(schedule, momentum=cf.get("momentum"))
    if opt_id == cf.OPTIMIZER_ADAM:
        return optax.adam(schedule)
    return optax.sgd(schedule)
