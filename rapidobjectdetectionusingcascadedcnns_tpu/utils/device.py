"""Compute-platform selection.

Analog of the reference's ``CpuGpuSwitcher`` (utils/cpu_gpu_switcher.py),
which toggled ``CUDA_VISIBLE_DEVICES`` to a single GPU id and could not
switch after TF initialization. The JAX equivalents:

  * the platform is a process-level property (``JAX_PLATFORMS`` env var or
    ``jax.config jax_platforms`` before backend init);
  * unlike the reference, *all* local accelerator devices are usable at once
    through the mesh layer (parallel/mesh.py) — the single-GPU restriction
    does not carry over.
"""

from __future__ import annotations

from typing import List, Optional

from . import log


def current_platform() -> str:
    import jax

    return jax.devices()[0].platform


def devices(platform: Optional[str] = None) -> List:
    import jax

    return jax.devices(platform) if platform else jax.devices()


def force_platform(platform: str, n_devices: Optional[int] = None) -> None:
    """Switch the process to ``platform`` (e.g. 'cpu', 'tpu'), optionally with
    a virtual CPU device count. Re-initializes JAX backends; arrays created
    before the switch stay on their original backend."""
    import jax

    jax.config.update("jax_platforms", platform)
    from jax.extend.backend import clear_backends

    clear_backends()
    if platform == "cpu" and n_devices is not None:
        jax.config.update("jax_num_cpu_devices", n_devices)
    log.log(
        "switched platform to {} ({} devices)".format(platform, len(jax.devices()))
    )


def memory_stats() -> dict:
    """Per-device memory statistics where the backend reports them."""
    import jax

    out = {}
    for dev in jax.devices():
        stats = getattr(dev, "memory_stats", lambda: None)()
        if stats:
            out[str(dev)] = stats
    return out
