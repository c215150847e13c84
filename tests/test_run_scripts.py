"""All CLI entry points must at least parse/compile (imports run under
``__name__ != "__main__"``, so nothing heavy executes)."""

import glob
import importlib.util
import os

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = sorted(glob.glob(os.path.join(REPO_ROOT, "run_*.py")))


def test_all_reference_actions_covered():
    names = {os.path.basename(s) for s in SCRIPTS}
    expected = {
        "run_train_single.py",
        "run_train_cascade.py",
        "run_tune_single.py",
        "run_tune_cascade.py",
        "run_inference_single.py",
        "run_inference_cascade.py",
        "run_inference_visual_single.py",
        "run_inference_visual_cascade.py",
        "run_inference_visual_opencv.py",
        "run_eval_fddb.py",
        "run_eval_runtime.py",
        "run_sampling.py",
        "run_loading_dataset.py",
        "run_loading_file_list.py",
        "run_remove_all_broken_images.py",
    }
    assert expected <= names, expected - names


@pytest.mark.parametrize("script", SCRIPTS, ids=[os.path.basename(s) for s in SCRIPTS])
def test_script_imports(script):
    spec = importlib.util.spec_from_file_location(
        "script_under_test_" + os.path.basename(script)[:-3], script
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # __main__ guard prevents heavy work
