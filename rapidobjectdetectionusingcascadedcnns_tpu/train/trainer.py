"""Single-net training loop.

Functional re-design of ``NetTrainable.train`` (network/net_trainable.py:159-309)
with all its robustness guards (SURVEY.md §5 failure detection):

  * NaN-loss abort (net_trainable.py:223-226);
  * constant-prediction detection on validation evals, raising
    :class:`ConstantPredictionException` after ``n_max_constant_evals``
    repeats (net_trainable.py:256-276);
  * best-snapshot tracking on the main validation criteria with rollback
    after ``restore_after`` stagnant iterations (net_trainable.py:287-295,
    311-336);
  * training timeout (net_trainable.py:300-306);
  * periodic validation/training evaluation at the reference's interrupt
    cadence (net_trainable.py:168-177, 247-282);
  * final evaluation restores the best snapshot and scores all splits
    (net_trainable.py:360-401).

All device work happens through the fused steps of :mod:`.train_step`; the
loop itself is pure host orchestration.
"""

from __future__ import annotations

import math
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as cf
from ..data.dataset import Dataset, DatasetSplit
from ..labels import IID_BACKGROUND, IID_FOREGROUND, n_labels
from ..models import cnn
from ..ops import augment as augment_ops
from ..utils import log
from . import checkpoint, metrics, optimizer as opt_mod, train_step


class ConstantPredictionException(Exception):
    """Raised when the net keeps predicting a single class
    (net_trainable.py:438-441)."""


class SingleNetTrainer:
    """Trains one cascade-stage CNN on a Dataset."""

    def __init__(
        self,
        dataset: Dataset,
        f_beta: Optional[float] = None,
        bottleneck_in_size: Optional[int] = None,
        nr: int = 1,
        nr_max: int = 1,
        seed: Optional[int] = None,
        snapshot_full_path: str = "",
        use_inception: bool = False,
        mesh=None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` for data-parallel
        training — every batch's leading axis is sharded over the mesh,
        parameters are replicated, and XLA inserts the gradient all-reduce
        over ICI (SURVEY.md §2.6 item 1; the reference trains on exactly one
        device, network/net_trainable.py:159-336 + cpu_gpu_switcher.py:14-17).
        When None, the ``train_mesh_devices`` config key is consulted
        (parallel/mesh.mesh_from_config), so ``run_train_*.py`` picks up
        multi-chip training from config alone."""
        from ..parallel import mesh as mesh_mod

        self.ds = dataset
        self.nr = nr
        self.nr_max = nr_max
        self.f_beta = f_beta
        self.mesh = mesh if mesh is not None else mesh_mod.mesh_from_config()
        if self.mesh is not None:
            log.log(
                "data-parallel training over {} devices (batch axis sharded, "
                "params replicated)".format(self.mesh.devices.size)
            )

        # the reference disables F-beta when positives dominate
        # (net_trainable.py:66-69)
        if self.f_beta is not None and dataset.train.positive_proportion > 0.5:
            log.log(
                "Warning: Disabling the usage of F-Beta, because there are more "
                "positive samples than negative ones. Weighted cross entropy "
                "will be used instead."
            )
            self.f_beta = None

        self._f_beta_key = (
            metrics.f_beta_key(self.f_beta) if self.f_beta is not None else None
        )
        self.main_criteria = (
            self._f_beta_key if self.f_beta is not None else cf.get("tuning_main_criteria")
        )

        img_size = dataset.image_shape[0]
        self.stage_config = cnn.StageConfig.from_config(
            img_size,
            bottleneck_in_size=bottleneck_in_size,
            backbone="inception" if use_inception else "custom",
        )

        self.iterations_per_epoch = math.ceil(
            dataset.train.n_samples / cf.get("batch_size")
        )
        self.iterations_total = int(cf.get("epochs_total") * self.iterations_per_epoch)

        seed = cf.get("seed") if seed is None else seed
        # one seed policy for everything this trainer draws: jit-side RNG via
        # the threaded key, host-side batch order via seeded iterators (an
        # unseeded iterator would make training irreproducible across runs —
        # and break single-vs-mesh metric identity)
        self._seed = seed + nr
        self._rng_key = jax.random.PRNGKey(seed + nr)

        optimizer = opt_mod.optimizer_from_config(self.iterations_total)
        if use_inception and cf.get("inception_weights_path"):
            # pretrained-trunk workflow: the grafted backbone stays FROZEN,
            # only the classifier head trains — the reference imports the
            # Inception graph as constants and trains the layers on top
            # (network/inception_builder.py:68-96, app/train_app.py:241-251)
            import optax

            def _head_only_mask(params):
                return {
                    k: jax.tree_util.tree_map(lambda _: k != "backbone", v)
                    for k, v in params.items()
                }

            optimizer = optax.masked(optimizer, _head_only_mask)
        self._optimizer = optimizer

        if snapshot_full_path:
            params, cfg_loaded, _, _, _ = checkpoint.load_stage(snapshot_full_path)
            self.state = train_step.TrainState(
                params=jax.tree_util.tree_map(jnp.asarray, params),
                opt_state=optimizer.init(params),
                step=jnp.zeros((), jnp.int32),
            )
        else:
            self._rng_key, init_key = jax.random.split(self._rng_key)
            self.state = train_step.init_train_state(
                init_key, self.stage_config, optimizer
            )

        loss_settings = train_step.LossSettings(
            f_beta=self.f_beta,
            positive_proportion=float(dataset.train.positive_proportion),
            weighted=cf.get("weighted_cross_entropy"),
            normalize=cf.get("weighted_cross_entropy_normalize"),
            l2_strength=float(cf.get("L2_regularization_strength")),
            l1_strength=float(cf.get("L1_regularization_strength")),
            dropout_keep=float(cf.get("dropout_rate")),
        )
        self._frozen_trunk = bool(
            use_inception and cf.get("inception_weights_path")
        )
        acfg = (
            augment_ops.AugmentConfig.from_config()
            if cf.get("data_augmentation_online") and not self._frozen_trunk
            else None
        )
        if self._frozen_trunk and cf.get("data_augmentation_online"):
            log.log(
                "frozen pretrained trunk: disabling online augmentation for "
                "this stage (images are embedded once through the trunk; the "
                "head trains on cached 2048-d bottlenecks)"
            )
        self._train_step = train_step.make_train_step(
            self.stage_config, optimizer, loss_settings, acfg
        )
        self._eval_step = train_step.make_eval_step(self.stage_config, self.f_beta)
        self._predict_step = train_step.make_predict_step(self.stage_config)

        pp = dataset.preprocessor
        size = self.stage_config.input_size
        mean = np.broadcast_to(
            np.asarray(pp.mean_image, np.float32), (size, size, 3)
        ).copy()
        std = np.broadcast_to(np.asarray(pp.std, np.float32), (size, size, 3)).copy()
        self._mean = jnp.asarray(mean)
        self._std = jnp.asarray(std)

        if self._frozen_trunk:
            # embed-once: run every split through the frozen trunk ONCE and
            # train/evaluate/predict the head on cached 2048-d bottlenecks.
            # The reference re-runs the frozen Inception graph every step
            # (inception_builder.py:68-96); embedding once is the idiomatic
            # frozen-trunk formulation — same numbers, a fraction of the
            # compute. The steps' standardization becomes the identity
            # (mean 0 / std 1): it already happened inside the embed pass.
            self._embed_splits_through_trunk()
            self._mean = jnp.zeros((), jnp.float32)
            self._std = jnp.ones((), jnp.float32)

        if self.mesh is not None:
            from ..parallel import mesh as mesh_mod

            # replicate everything the steps close over; batches are sharded
            # per call in _place_batch
            self.state = mesh_mod.replicate(self.mesh, self.state)
            self._mean, self._std = mesh_mod.replicate(
                self.mesh, (self._mean, self._std)
            )

        # best-snapshot tracking
        self.best_val_results: Optional[Dict[str, float]] = None
        self.best_params = None
        self.iterations_since_best_found = 0
        self._last_loss = None

    # ---------------- helpers ----------------

    def _embed_splits_through_trunk(self, chunk: int = 8) -> None:
        """Replace every split's images with their frozen-trunk embeddings
        (one fixed-shape jitted program, padded last chunk). Mutates the
        per-stage dataset in place: downstream predict/eval/combined-eval
        consume the same embedded arrays through apply_stage's 2D path."""
        import jax as _jax

        from ..models import inception

        backbone = jax.tree_util.tree_map(jnp.asarray, self.state.params["backbone"])
        mean, std = self._mean, self._std

        @_jax.jit
        def embed(images_u8):
            x = (images_u8.astype(jnp.float32) - mean) / std
            return inception.apply_backbone(backbone, x)

        for split in (self.ds.train, self.ds.valid, self.ds.test):
            imgs = split.images
            if imgs.ndim != 4 or len(imgs) == 0:
                continue  # already embedded (shared split) or empty
            out = np.empty(
                (len(imgs), inception.BOTTLENECK_TENSOR_SIZE), np.float32
            )
            for s in range(0, len(imgs), chunk):
                block = imgs[s : s + chunk]
                pad = chunk - len(block)
                if pad:
                    block = np.concatenate(
                        [block, np.repeat(block[-1:], pad, axis=0)]
                    )
                out[s : s + chunk - pad] = np.asarray(embed(jnp.asarray(block)))[
                    : chunk - pad
                ]
            split.images = out
        log.log(
            "embedded {} train / {} valid / {} test samples through the "
            "frozen trunk".format(
                self.ds.train.n_samples, self.ds.valid.n_samples,
                self.ds.test.n_samples,
            )
        )

    def _batch_bottlenecks(self, batch) -> np.ndarray:
        if self.stage_config.bottleneck_in_size is None:
            return np.zeros((batch.n_samples, 1), np.float32)
        if batch.bottlenecks is None:
            raise ValueError(
                "stage {} requires bottlenecks from the previous net".format(self.nr)
            )
        return np.asarray(batch.bottlenecks)

    def _place_batch(self, batch):
        """Place one host batch on device(s).

        Single device: plain device transfers, mask of ones. With a mesh: the
        leading axis is padded to a device multiple (padding rows excluded
        from loss/metrics via the mask) and sharded over the mesh's data
        axis. Returns (images, labels, bottlenecks, valid_mask)."""
        images = np.asarray(batch.images)
        labels = np.asarray(batch.labels)
        bneck = self._batch_bottlenecks(batch)
        if self.mesh is None:
            return (
                jnp.asarray(images),
                jnp.asarray(labels),
                jnp.asarray(bneck),
                jnp.ones((batch.n_samples,), bool),
            )
        from ..parallel import mesh as mesh_mod

        d = self.mesh.devices.size
        images_p, n = mesh_mod.pad_to_multiple(images, d)
        labels_p, _ = mesh_mod.pad_to_multiple(labels, d)
        bneck_p, _ = mesh_mod.pad_to_multiple(bneck, d)
        mask = np.arange(images_p.shape[0]) < n
        return mesh_mod.shard_batch(self.mesh, images_p, labels_p, bneck_p, mask)

    def evaluate_split(
        self, split: DatasetSplit, log_line: Optional[str] = None
    ) -> Dict[str, float]:
        """Full-split metric evaluation in batches (net.py:282-332,445-483)."""
        it = split.new_default_iterator(cf.get("max_batch_size"), seed=self._seed)
        totals: Dict[str, float] = {}
        n_batches = 0
        while it.in_first_epoch:
            batch = it.next_batch
            images, labels, bneck, mask = self._place_batch(batch)
            counts = self._eval_step(
                self.state.params,
                images,
                labels,
                bneck,
                self._mean,
                self._std,
                mask,
            )
            for k, v in counts.items():
                totals[k] = totals.get(k, 0.0) + float(v)
            n_batches += 1
        results = metrics.process_results(totals, self.f_beta)
        if log_line is not None:
            metrics.log_results(results, log_line)
        return results

    def predict(
        self,
        split: DatasetSplit,
        update_bottlenecks: bool = False,
        return_probabilities: bool = False,
    ):
        """Deterministic-order prediction over a split (net.py:572-652)."""
        if update_bottlenecks and self.nr == self.nr_max:
            log.log(
                "Not caching the new bottlenecks, because the last net of a "
                "cascade has been reached."
            )
            update_bottlenecks = False

        n = split.n_samples
        label_predictions = np.empty((n,), np.int64)
        probabilities = (
            np.empty((n, n_labels()), np.float32) if return_probabilities else None
        )
        new_bottlenecks = (
            np.empty((n, self.stage_config.bottleneck_out_size), np.float32)
            if update_bottlenecks
            else None
        )

        from ..data.dataset import DeterministicIterator

        it = DeterministicIterator(
            split, cf.get("max_batch_size"), shuffle_every_epoch=False
        )
        start = 0
        while it.in_first_epoch:
            batch = it.next_batch
            end = start + batch.n_samples
            images, labels, bneck_in, _ = self._place_batch(batch)
            best, probs, bneck = self._predict_step(
                self.state.params,
                images,
                labels,
                bneck_in,
                self._mean,
                self._std,
            )
            # [: n_samples] drops mesh-padding rows (no-op on single device)
            label_predictions[start:end] = np.asarray(best)[: batch.n_samples]
            if return_probabilities:
                probabilities[start:end] = np.asarray(probs)[: batch.n_samples]
            if update_bottlenecks:
                new_bottlenecks[start:end] = np.asarray(bneck)[: batch.n_samples]
            start = end

        if update_bottlenecks:
            split.set_bottlenecks(new_bottlenecks)
        return label_predictions, probabilities

    @property
    def bottleneck_out_size(self) -> int:
        return self.stage_config.bottleneck_out_size

    # ---------------- training loop ----------------

    def train(self) -> None:
        start_time = time.time()
        summary_path = self._open_summary()

        interrupt_often = 100
        interrupt_sometimes = max(
            1,
            min(
                10000,
                math.floor(cf.get("epochs_total") * self.iterations_per_epoch / 4),
            ),
        )
        interrupt_seldom = interrupt_sometimes * 3
        max_eval_step = self.iterations_total * 0.85  # skip evals in last 15%

        n_const_predict = np.zeros((n_labels(),), np.uint8)
        cancel = False

        from ..data.prefetch import PrefetchIterator

        it = self.ds.train.new_default_iterator(
            cf.get("batch_size"), seed=self._seed
        )
        step = 0
        while it.epoch < cf.get("epochs_total"):
            if cancel:
                break
            log.log("Epoch {}/{}".format(it.epoch + 1, cf.get("epochs_total")))
            # host-side batch assembly runs ahead of the device in a
            # background thread (SURVEY.md §2.6 host-parallel input pipeline)
            for batch in PrefetchIterator(iter(it), depth=2):
                step += 1
                self._rng_key, step_key = jax.random.split(self._rng_key)
                images, labels, bneck, mask = self._place_batch(batch)
                self.state, loss = self._train_step(
                    self.state,
                    images,
                    labels,
                    bneck,
                    self._mean,
                    self._std,
                    step_key,
                    mask,
                )

                if step % interrupt_often == 1 or step == self.iterations_total:
                    loss_value = float(loss)
                    self._last_loss = loss_value
                    if math.isnan(loss_value):
                        log.log("ERROR: loss value is nan. Cancelling training.")
                        cancel = True
                        break
                    log.log(
                        "Iteration {}/{}: loss = {:.4f}".format(
                            step, self.iterations_total, loss_value
                        )
                    )
                    self._write_summary(summary_path, step, loss_value)

                if (
                    step % interrupt_sometimes == 0
                    and step < max_eval_step
                    and step != self.iterations_total
                ):
                    res_val = self.evaluate_split(self.ds.valid, " -> validation:")
                    self._check_constant_prediction(res_val, n_const_predict)
                    if step % interrupt_seldom == 0:
                        self.evaluate_split(self.ds.train, " -> training:")
                    self._update_best_val_results(res_val)

                if (
                    cf.get("restore_after") is not None
                    and self.iterations_since_best_found > cf.get("restore_after")
                    and step != self.iterations_total
                    and self.best_params is not None
                ):
                    self.iterations_since_best_found = 0
                    log.log(
                        "Step back: restoring best parameters (no progress for "
                        "more than {} iterations).".format(cf.get("restore_after"))
                    )
                    self.state = train_step.TrainState(
                        params=self.best_params,
                        opt_state=self.state.opt_state,
                        step=self.state.step,
                    )

                self.iterations_since_best_found += 1

                if cf.get("timeout_minutes") > 0 and (
                    time.time() - start_time > cf.get("timeout_seconds")
                ):
                    log.log("TIMEOUT: stopping earlier. saving current work.")
                    cancel = True
                    break

        self.stop_training()

    def _open_summary(self) -> str:
        """Per-session training-scalars log (the reference records loss +
        learning rate via TF summaries for TensorBoard,
        net_trainable.py:146-151; here a JSONL scalar stream under the same
        summary_dir)."""
        import json

        directory = cf.ensure_dir(
            os.path.join(cf.get("summary_dir"), cf.get("session_key"))
        )
        path = os.path.join(directory, "scalars_net{}.jsonl".format(self.nr))
        with open(path, "a") as f:
            f.write(
                json.dumps(
                    {
                        "event": "start",
                        "iterations_total": self.iterations_total,
                        "main_criteria": self.main_criteria,
                    }
                )
                + "\n"
            )
        return path

    def _write_summary(self, path: str, step: int, loss_value: float) -> None:
        import json

        lr = float(
            opt_mod.lr_schedule_from_config(self.iterations_total)(step)
        )
        with open(path, "a") as f:
            f.write(
                json.dumps({"step": step, "loss": loss_value, "learning_rate": lr})
                + "\n"
            )

    def _check_constant_prediction(self, res_val, n_const_predict) -> None:
        if (res_val["true_positives"] + res_val["false_positives"]) == 0:
            n_const_predict[IID_BACKGROUND] += 1
            log.log(
                "WARNING: validation evaluation suggests constant background "
                "prediction ({} times)".format(n_const_predict[IID_BACKGROUND])
            )
            limit = cf.get("n_max_constant_evals")
            if limit is not None and n_const_predict[IID_BACKGROUND] > limit:
                raise ConstantPredictionException(
                    "validation evaluation suggests constant background "
                    "prediction too often. Cancelling training."
                )
        elif (res_val["true_negatives"] + res_val["false_negatives"]) == 0:
            n_const_predict[IID_FOREGROUND] += 1
            log.log(
                "WARNING: validation evaluation suggests constant foreground "
                "prediction ({} times)".format(n_const_predict[IID_FOREGROUND])
            )
            limit = cf.get("n_max_constant_evals")
            if limit is not None and n_const_predict[IID_FOREGROUND] > limit:
                raise ConstantPredictionException(
                    "validation evaluation suggests constant foreground "
                    "prediction too often. Cancelling training."
                )

    def _update_best_val_results(self, res_val) -> None:
        if (
            self.best_val_results is None
            or res_val[self.main_criteria] > self.best_val_results[self.main_criteria]
        ):
            self.best_params = jax.tree_util.tree_map(
                lambda x: x, self.state.params
            )  # cheap reference copy; params are immutable jax arrays
            self.best_val_results = res_val
            self.iterations_since_best_found = 0
            log.log(
                "Updated best model with validation {} of {}".format(
                    self.main_criteria,
                    metrics.get(self.main_criteria).format(res_val[self.main_criteria]),
                )
            )
            self._save_snapshot(res_val)

    def _save_snapshot(self, res_val) -> None:
        snap_dir = os.path.join(
            cf.get("snapshot_dir"), cf.get("session_key")
        )
        cf.ensure_dir(snap_dir)
        path = os.path.join(
            snap_dir,
            "val_{}_{:.3f}_net{}".format(
                self.main_criteria, res_val[self.main_criteria], self.nr
            ),
        )
        pp = self.ds.preprocessor
        checkpoint.save_stage(
            path,
            self.state.params,
            self.stage_config,
            np.asarray(self._mean),
            np.asarray(self._std),
            extra_meta={"val_results": {k: float(v) for k, v in res_val.items()}},
        )

    def stop_training(self) -> None:
        """Final best-vs-current check (net_trainable.py:338-357)."""
        if self.iterations_since_best_found > 1:
            log.log("Ensure that the last known best snapshot is still better.")
            res_val = self.evaluate_split(self.ds.valid)
            self._update_best_val_results(res_val)
        log.log(".. training finished.")

    def restore_best(self) -> None:
        if self.best_params is not None and self.iterations_since_best_found > 1:
            self.state = train_step.TrainState(
                params=self.best_params,
                opt_state=self.state.opt_state,
                step=self.state.step,
            )
            log.log("Restored best parameters of this run.")

    def final_evaluation(self):
        """Restore best model and evaluate all splits
        (net_trainable.py:360-401)."""
        log.log("starting final evaluation")
        self.restore_best()
        if self.best_val_results is not None:
            val_eval = self.best_val_results
            metrics.log_results(val_eval, "FINAL validation set evaluation:")
        else:
            val_eval = self.evaluate_split(
                self.ds.valid, "FINAL validation set evaluation:"
            )
        train_eval = self.evaluate_split(
            self.ds.train, "FINAL training set evaluation:"
        )
        test_eval = self.evaluate_split(self.ds.test, "FINAL test set evaluation:")
        log.log("final evaluation is done.")
        return val_eval, test_eval, train_eval

    # -------- deployment artifacts --------

    def mean_std(self):
        return np.asarray(self._mean), np.asarray(self._std)

    def export(self, model_dir: str, session_key: str, stage: Optional[int] = None):
        """Persist the trained stage as a deployment artifact (the analog of
        the reference's freeze+optimize+export pipeline,
        app/train_app.py:177-227)."""
        cf.ensure_dir(model_dir)
        if stage is None:
            path = checkpoint.single_model_path(model_dir, session_key)
        else:
            path = checkpoint.cascade_stage_path(model_dir, session_key, stage)
        mean, std = self.mean_std()
        return checkpoint.save_stage(
            path, self.state.params, self.stage_config, mean, std
        )
