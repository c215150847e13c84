"""TPU-native cascaded-CNN object detection framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``Johnson145/RapidObjectDetectionUsingCascadedCNNs`` (a TF-1.4 + OpenCV
research framework for binary object detection via a boosted cascade of
small CNNs; see ``/root/reference`` and SURVEY.md).

Design stance (TPU-first, not a port):
  * All hot compute (pyramid resize, dense window extraction, the cascade
    CNNs, early-reject mask compaction, augmentation, NMS clustering) runs
    as jitted XLA programs over fixed-shape batched arrays.
  * Python exists only for orchestration and I/O.
  * Multi-chip scaling is expressed with ``jax.sharding.Mesh`` + collectives
    (the reference is strictly single-device; see SURVEY.md §2.6).

Import alias: ``import rodc_tpu`` (see repo-root ``rodc_tpu.py``).
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
from . import labels  # noqa: F401
