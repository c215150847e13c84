"""Committed-artifact integrity: every recorded experiment the docs cite is
machine-checked for schema + internal consistency, so a regenerated artifact
that contradicts its own claims (or a stale doc number) fails the suite
rather than drifting silently (VERDICT r3 weak 4)."""

import json
import os

import pytest

ARTIFACT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts"
)


def _load(name):
    path = os.path.join(ARTIFACT_DIR, name)
    if not os.path.exists(path):
        pytest.skip("{} not present on this machine".format(name))
    with open(path) as f:
        return json.load(f)


def test_runtime_eval_density_sweep_proves_the_thesis():
    """The reference's core claim (cascade faster than the single net,
    README.md:69-71) must hold in the recorded staged sweep: >= 1.0x in
    every cell, and materially >1x at VGA (VERDICT r3 item 1 done
    criterion)."""
    d = _load("runtime_eval.json")
    sweep = d.get("density_sweep")
    assert sweep, "density_sweep section missing from runtime_eval.json"
    results = sweep["results"]
    assert len(results) >= 4
    for key, cell in results.items():
        assert cell["speedup_cascade_vs_single"] >= 1.0, (key, cell)
        assert not cell["cascade"]["saturated"], key
        assert cell["cascade"]["fps"] > 0 and cell["single"]["fps"] > 0
    vga = [v for k, v in results.items() if k.startswith("480x640")]
    assert vga and all(v["speedup_cascade_vs_single"] >= 1.5 for v in vga)


def test_vj_baseline_is_self_contained():
    d = _load("fddb_vj_baseline.json")
    assert "/root/reference" not in d["model_xml"]
    assert d["n_faces"] > 0
    vj_rate = d["roc"][-1]["detection_rate"]
    assert 0.0 < vj_rate <= 1.0
    # the reference's headline comparison: the cascaded CNNs beat VJ
    assert d["cascade_comparison"]["tail"]["detection_rate"] > vj_rate


def test_flagship_eval_miss_accounting_is_consistent():
    d = _load("flagship_eval.json")
    assert d["n_scenes"] >= 100
    misses = d.get("misses", [])
    assert len(misses) == round((1 - d["recall"]) * d["n_faces"])
    # the recorded narrative must match the artifact: a miss is
    # grid-limited only if the pyramid cannot cover it (the tool's
    # definition, tools/train_flagship.py evaluate_on_scenes)
    grid_limited = sum(1 for m in misses if m["grid_ceiling_iou"] <= 0.3)
    assert grid_limited == d["misses_grid_limited"]


def _check_roc(d):
    assert d["n_faces"] > 0
    roc = d["roc"]
    assert roc, "empty ROC"
    # sweeping the threshold DOWN admits more detections: both TP and FP
    # grow monotonically along the recorded curve
    for a, b in zip(roc, roc[1:]):
        assert b["true_positives"] >= a["true_positives"]
        assert b["false_positives"] >= a["false_positives"]
    for p in roc:
        assert 0.0 <= p["detection_rate"] <= 1.0


def test_fddb_roc_artifacts():
    tuned = _load("fddb_roc.json")
    _check_roc(tuned)
    assert tuned["config"]["window_scale_factor"] <= 1.01


def test_fddb_roc_default_config_artifact():
    default = _load("fddb_roc_default.json")
    _check_roc(default)
    cfg = default["config"]
    assert cfg["thresholds"] == 0.5, "reference default is one scalar 0.5"
    assert not cfg["resize_buckets"], "reference default is exact geometry"


def test_tuning_session_artifact():
    d = _load("tuning_random.json")
    assert d["n_sessions"] >= 8
    assert len(d["sessions"]) == d["n_sessions"]
    grids_keys = set(d["param_keys"])
    scores = []
    for s in d["sessions"]:
        assert set(s["config"]) == grids_keys
        if s["score"] is not None:
            scores.append(s["score"])
    assert scores, "no session produced a score"
    assert d["best"] is not None
    assert d["best"]["score"] == max(scores)


def test_cross_platform_check_artifact():
    d = _load("cross_platform_check.json")
    assert d["ok"], d.get("mismatch_scenes")
    assert set(d["platforms"]) == {"tpu", "cpu"}
