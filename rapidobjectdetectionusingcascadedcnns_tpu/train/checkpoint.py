"""Checkpointing: numpy-archive snapshots of pure pytrees.

Replaces both reference persistence mechanisms (SURVEY.md §5):
  * ``tf.train.Saver`` training snapshots (network/net.py:254,
    net_trainable.py:321-329) -> :func:`save_stage` / :func:`load_stage`;
  * the frozen-GraphDef ``.pb`` deployment export pipeline
    (app/train_app.py:177-227, network/inference_optimizer.py) ->
    :func:`save_cascade` / :func:`load_cascade`. Freezing/inference-graph
    optimization is unnecessary in JAX — parameters ARE data; the jitted
    apply function plays the role of the optimized inference graph, and the
    saved ``meta.json`` carries the input-dims metadata the reference
    re-derives from graph tensor shapes (app/inference_app.py:276-295).

Format: one ``.npz`` per artifact with path-flattened leaf names plus a JSON
sidecar holding architecture metadata.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Tuple

import jax
import numpy as np

from ..models import cnn


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    flat = {}
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _stage_config_to_json(cfg: cnn.StageConfig) -> dict:
    return {
        "input_size": cfg.input_size,
        "channels": cfg.channels,
        "conv_filter_sizes": list(cfg.conv_filter_sizes),
        "conv_kernel": cfg.conv_kernel,
        "conv_stride": cfg.conv_stride,
        "pooling_size": cfg.pooling_size,
        "pooling_stride": cfg.pooling_stride,
        "fc1_size": cfg.fc1_size,
        "n_classes": cfg.n_classes,
        "bottleneck_in_size": cfg.bottleneck_in_size,
        "compute_dtype": "bfloat16" if cfg.compute_dtype.__name__ == "bfloat16" else "float32",
        "backbone": cfg.backbone,
    }


def _stage_config_from_json(d: dict) -> cnn.StageConfig:
    import jax.numpy as jnp

    return cnn.StageConfig(
        input_size=d["input_size"],
        channels=d["channels"],
        conv_filter_sizes=tuple(d["conv_filter_sizes"]),
        conv_kernel=d["conv_kernel"],
        conv_stride=d["conv_stride"],
        pooling_size=d["pooling_size"],
        pooling_stride=d["pooling_stride"],
        fc1_size=d["fc1_size"],
        n_classes=d["n_classes"],
        bottleneck_in_size=d["bottleneck_in_size"],
        compute_dtype=jnp.bfloat16 if d["compute_dtype"] == "bfloat16" else jnp.float32,
        backbone=d.get("backbone", "custom"),
    )


def _rebuild_params(
    flat: Dict[str, np.ndarray], cfg: cnn.StageConfig
) -> cnn.Params:
    if cfg.backbone == "inception":
        from ..models import inception

        backbone_flat = {
            k[len("backbone/"):]: v
            for k, v in flat.items()
            if k.startswith("backbone/")
        }
        params: cnn.Params = {
            "backbone": inception.params_from_flat(backbone_flat),
            "fc2": {"W": flat["fc2/W"], "b": flat["fc2/b"]},
        }
        return params
    n_conv = len(cfg.conv_filter_sizes)
    params = {"conv": [], "fc1": {}, "fc2": {}}
    for i in range(n_conv):
        params["conv"].append(
            {"W": flat[f"conv/{i}/W"], "b": flat[f"conv/{i}/b"]}
        )
    params["fc1"] = {"W": flat["fc1/W"], "b": flat["fc1/b"]}
    params["fc2"] = {"W": flat["fc2/W"], "b": flat["fc2/b"]}
    return params


def save_stage(
    path: str,
    params: cnn.Params,
    cfg: cnn.StageConfig,
    mean: np.ndarray,
    std: np.ndarray,
    extra_meta: dict | None = None,
) -> str:
    """Persist one cascade stage (params + architecture + standardization)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = _flatten(params)
    flat["__mean__"] = np.asarray(mean, np.float32)
    flat["__std__"] = np.asarray(std, np.float32)
    np.savez(path if path.endswith(".npz") else path + ".npz", **flat)
    meta = {"stage_config": _stage_config_to_json(cfg)}
    if extra_meta:
        meta.update(extra_meta)
    meta_path = (path[:-4] if path.endswith(".npz") else path) + ".json"
    with open(meta_path, "w") as f:
        json.dump(meta, f, indent=2)
    return path if path.endswith(".npz") else path + ".npz"


def load_stage(path: str) -> Tuple[cnn.Params, cnn.StageConfig, np.ndarray, np.ndarray, dict]:
    npz_path = path if path.endswith(".npz") else path + ".npz"
    meta_path = npz_path[:-4] + ".json"
    with open(meta_path) as f:
        meta = json.load(f)
    cfg = _stage_config_from_json(meta["stage_config"])
    with np.load(npz_path) as data:
        flat = {k: data[k] for k in data.files}
    mean = flat.pop("__mean__")
    std = flat.pop("__std__")
    params = _rebuild_params(flat, cfg)
    return params, cfg, mean, std, meta


def cascade_stage_path(model_dir: str, session_key: str, stage: int) -> str:
    """Per-stage artifact path, mirroring the reference's
    ``graph_<session_key>_<stage>.pb`` naming (train_cascade_app.py:183-201)."""
    return os.path.join(model_dir, "model_{}_{}.npz".format(session_key, stage))


def single_model_path(model_dir: str, session_key: str) -> str:
    return os.path.join(model_dir, "model_{}.npz".format(session_key))


def save_cascade(model_dir: str, session_key: str, model) -> List[str]:
    """Persist a full CascadeModel as per-stage artifacts."""
    paths = []
    for i in range(model.n_nets):
        p = cascade_stage_path(model_dir, session_key, i)
        save_stage(
            p,
            model.stage_params[i],
            model.stage_configs[i],
            model.stage_means[i],
            model.stage_stds[i],
            extra_meta={"stage_index": i, "n_nets": model.n_nets},
        )
        paths.append(p)
    return paths


def load_cascade(model_dir: str, session_key: str):
    """Load a cascade by probing stage files until one is missing
    (the reference discovers cascade length the same way,
    app/inference_cascade_app.py:36-51)."""
    from ..models.cascade import CascadeModel

    params_list, cfg_list, means, stds = [], [], [], []
    stage = 0
    while True:
        p = cascade_stage_path(model_dir, session_key, stage)
        if not os.path.exists(p):
            break
        params, cfg, mean, std, _ = load_stage(p)
        params_list.append(params)
        cfg_list.append(cfg)
        means.append(mean)
        stds.append(std)
        stage += 1
    if stage < 1:
        raise FileNotFoundError(
            "Could not find any model files for cascade session {} in {}".format(
                session_key, model_dir
            )
        )
    if stage == 1:
        raise FileNotFoundError(
            "Found a single model file, but a cascade must consist of at least two"
        )
    return CascadeModel(params_list, cfg_list, means, stds)


def load_single(model_dir: str, session_key: str):
    path = single_model_path(model_dir, session_key)
    if not os.path.exists(path):
        raise FileNotFoundError("Could not find the required model file: " + path)
    return load_stage(path)
