"""Multi-host (multi-process) training entry points.

The reference is a single process on a single GPU (SURVEY.md §2.6). The
TPU-native deployment shape is N hosts × M chips: every process runs the
same program, `jax.distributed` coordinates them, each host feeds its local
shard of the global batch, and XLA's collectives (inserted by jit over the
global mesh) reduce gradients/metrics over ICI/DCN.

Pieces:
  * :func:`initialize` — `jax.distributed.initialize` wrapper (env- or
    argument-driven), idempotent;
  * :func:`global_mesh` — the mesh over ALL processes' devices;
  * :func:`host_local_batch_to_global` — wraps
    `jax.make_array_from_process_local_data`: each host contributes its rows
    of the globally batch-sharded array (pairs with
    `data.prefetch.shard_for_host`, which partitions the corpus per host);
  * :func:`rehearsal` — one data-parallel training + eval step over the
    global mesh; used by tools/multihost_worker.py and the 2-process CPU
    rehearsal test (tests/test_multihost.py) to prove the mesh helpers work
    unchanged under real multi-process jax.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed (idempotent). With no arguments, reads the
    standard env (JAX_COORDINATOR_ADDRESS etc.) or stays single-process."""
    import jax

    if jax.process_count() > 1:
        return  # already initialized
    if coordinator_address is None:
        import os

        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
        if coordinator_address is None:
            return  # single-process run
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh():
    """1-D data mesh over every device of every process."""
    from .mesh import get_mesh

    return get_mesh()


def host_local_batch_to_global(mesh, *host_arrays):
    """Assemble globally batch-sharded arrays from per-host local shards.

    Each process passes its LOCAL rows (global_batch / process_count); the
    result is one global jax.Array sharded over the mesh's data axis, exactly
    what the jitted train step consumes.
    """
    import jax

    from .mesh import batch_sharding

    sharding = batch_sharding(mesh)
    out = tuple(
        jax.make_array_from_process_local_data(sharding, np.asarray(a))
        for a in host_arrays
    )
    return out if len(out) > 1 else out[0]


def rehearsal(global_batch: int = 32, seed: int = 0) -> Dict[str, Any]:
    """One deterministic data-parallel train+eval step over the global mesh.

    Every process computes its host-local shard of the same global batch
    (derived from ``seed`` so the run is process-count invariant), feeds it
    through :func:`host_local_batch_to_global`, and executes the jitted
    training step. Returns {loss, eval counts, process info}; identical
    across processes and equal to a single-process run of the same batch.
    """
    import jax

    from .. import config as cf
    from ..data.prefetch import shard_for_host
    from ..models import cnn
    from ..train import optimizer as opt_mod
    from ..train import train_step
    from . import mesh as mesh_mod

    cf.set("conv_filter_sizes", [8])
    cf.set("fc1_size", 32)
    cf.set("compute_dtype", "float32")
    cf.set("optimizer", cf.OPTIMIZER_SGD)
    cf.set("data_augmentation_online", False)

    mesh = global_mesh()
    size = 12
    stage_cfg = cnn.StageConfig.from_config(size, bottleneck_in_size=16)
    optimizer = opt_mod.optimizer_from_config(iterations_total=100)
    state = train_step.init_train_state(jax.random.PRNGKey(seed), stage_cfg, optimizer)

    loss_settings = train_step.LossSettings(
        f_beta=8.0,
        positive_proportion=0.25,
        weighted=True,
        normalize=False,
        l2_strength=1e-4,
        l1_strength=0.0,
        dropout_keep=1.0,  # deterministic across processes
    )
    from ..ops import augment as augment_ops

    step = train_step.make_train_step(
        stage_cfg, optimizer, loss_settings, augment_ops.AugmentConfig.from_config()
    )

    # the GLOBAL batch, derived deterministically; each host takes its rows
    rng = np.random.RandomState(seed)
    images = rng.randint(0, 256, size=(global_batch, size, size, 3), dtype=np.uint8)
    labels = (np.arange(global_batch) % 2).astype(np.int32)
    bottlenecks = rng.rand(global_batch, 16).astype(np.float32)

    # contiguous per-host rows (make_array_from_process_local_data expects
    # each process to own a contiguous slab of the leading axis)
    per_host = global_batch // jax.process_count()
    lo = jax.process_index() * per_host
    hi = lo + per_host
    images_g, labels_g, bneck_g = host_local_batch_to_global(
        mesh, images[lo:hi], labels[lo:hi], bottlenecks[lo:hi]
    )

    state = mesh_mod.replicate(mesh, state)
    mean = np.full((size, size, 3), 127.5, np.float32)
    std = np.full((size, size, 3), 64.0, np.float32)
    mean_r, std_r = mesh_mod.replicate(mesh, (mean, std))

    new_state, loss = step(
        state, images_g, labels_g, bneck_g, mean_r, std_r, jax.random.PRNGKey(1)
    )

    eval_step = train_step.make_eval_step(stage_cfg, f_beta=8.0)
    counts = eval_step(
        new_state.params,
        images_g,
        labels_g,
        bneck_g,
        mean_r,
        std_r,
        jax.device_put(
            np.ones((global_batch,), bool), mesh_mod.batch_sharding(mesh)
        ),
    )

    # shard_for_host round-trip sanity: the strided corpus partition covers
    # every sample exactly once across processes
    corpus = list(range(100))
    local = shard_for_host(corpus)
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "loss": float(loss),
        "eval_total": int(
            counts["true_positives"]
            + counts["false_positives"]
            + counts["true_negatives"]
            + counts["false_negatives"]
        ),
        "host_corpus_len": len(local),
    }


def workflow_rehearsal(
    work_dir: str, epochs: int = 2, seed: int = 0
) -> Dict[str, Any]:
    """The full multi-host TRAINING WORKFLOW, not just one step: a real
    multi-epoch :class:`~..train.trainer.SingleNetTrainer.train` run over the
    global mesh, checkpoint export on process 0, restore on EVERY process,
    and a post-restore evaluation that must be identical across processes
    (and to the exporting trainer's own evaluation).

    This rehearses the deployment shape the reference cannot express
    (single process, one GPU — SURVEY.md §2.6): N processes run the same
    trainer code, batches are globally sharded, gradients all-reduce over
    ICI/DCN, and the checkpoint artifact round-trips across hosts. The
    processes here share one filesystem; a multi-node deployment would swap
    the export path for shared storage (the npz format needs nothing else).
    """
    import os

    import jax
    from jax.experimental import multihost_utils

    from .. import config as cf
    from ..train.cascade_trainer import SyntheticProvider
    from ..train.trainer import SingleNetTrainer

    proc = jax.process_index()

    cf.set("conv_filter_sizes", [8])
    cf.set("fc1_size", 32)
    cf.set("compute_dtype", "float32")
    cf.set("optimizer", cf.OPTIMIZER_ADAM)
    cf.set("learning_rate_init", 0.003)
    cf.set("data_augmentation_online", False)
    cf.set("dropout_rate", 1.0)
    cf.set("batch_size", 32)
    cf.set("max_batch_size", 64)
    cf.set("epochs_total", epochs)
    cf.set("n_max_constant_evals", None)
    # per-process scratch for snapshots/summaries (the shared session_key
    # would otherwise race on one file)
    cf.set("snapshot_dir", os.path.join(work_dir, "snap_p{}".format(proc)))
    cf.set("summary_dir", os.path.join(work_dir, "summary_p{}".format(proc)))

    mesh = global_mesh()
    # identical corpora on every process: batches assemble identically, so
    # device_put against the global sharding sees consistent host values
    provider = SyntheticProvider(32, 32, [12], seed=seed)
    ds = provider.dataset(12)

    trainer = SingleNetTrainer(ds, f_beta=None, seed=seed, mesh=mesh)
    trainer.train()
    pre_eval = trainer.evaluate_split(ds.valid)

    # process 0 exports; everyone syncs, then everyone restores the SAME file
    export_dir = os.path.join(work_dir, "export")
    ckpt_path = None
    if proc == 0:
        os.makedirs(export_dir, exist_ok=True)
        ckpt_path = trainer.export(export_dir, "mh_workflow")
    multihost_utils.sync_global_devices("rodc_workflow_ckpt_saved")
    if ckpt_path is None:
        from ..train import checkpoint

        ckpt_path = checkpoint.single_model_path(export_dir, "mh_workflow")

    restored = SingleNetTrainer(
        ds, f_beta=None, seed=seed + 99, snapshot_full_path=str(ckpt_path),
        mesh=mesh,
    )
    post_eval = restored.evaluate_split(ds.valid)

    count_keys = (
        "true_positives", "false_positives", "true_negatives", "false_negatives",
    )
    return {
        "process_index": proc,
        "process_count": jax.process_count(),
        "epochs": epochs,
        "iterations_total": trainer.iterations_total,
        "final_loss": trainer._last_loss,
        "pre_eval_counts": {k: pre_eval[k] for k in count_keys},
        "post_restore_counts": {k: post_eval[k] for k in count_keys},
        "checkpoint": str(ckpt_path),
    }
