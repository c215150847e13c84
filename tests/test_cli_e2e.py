"""CLI main-path execution: run the actual ``run_*.py`` scripts as
subprocesses against a tiny on-disk corpus configured through the
``rodc_local.py`` overlay — the reference's config_local.py flow
(reference config.py:487-494). Complements tests/test_run_scripts.py
(import/coverage checks) and the per-app class tests by exercising the
``__main__`` wiring end-to-end: overlay merge, file discovery, dataset
cache build, broken-image quarantine."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def cli_home(tmp_path):
    """A disposable RODC home: tiny native corpus + rodc_local.py overlay."""
    from PIL import Image

    from rapidobjectdetectionusingcascadedcnns_tpu.data.synthetic import (
        draw_background,
        draw_face,
    )

    root = tmp_path / "native"
    fg = root / "testset" / "foreground"
    bg = root / "testset" / "background"
    fg.mkdir(parents=True)
    bg.mkdir(parents=True)
    rs = np.random.RandomState(7)
    for i in range(3):
        Image.fromarray(draw_face(rs, 48)).save(fg / "face_{}.png".format(i))
    for i in range(4):
        Image.fromarray(draw_background(rs, 48)).save(bg / "bg_{}.png".format(i))

    overlay = tmp_path / "rodc_local.py"
    overlay.write_text(
        "cf = {{\n"
        "    'project_extension_root': {root!r},\n"
        "    'project_extension_root_fast': {root!r},\n"
        "    'dataset_native_path_root': {native!r},\n"
        "    'dataset_path_root': {native!r},\n"
        "    'dataset_keys': ['testset'],\n"
        "    'class_min_images': None,\n"
        "    'class_max_images': None,\n"
        "    'img_width': 12,\n"
        "    'img_height': 12,\n"
        "    'cache_dataset': False,\n"
        "}}\n".format(root=str(tmp_path), native=str(root))
    )
    return tmp_path, root


def _run_script(name, cli_home, timeout=240):
    tmp_path, _root = cli_home
    env = dict(os.environ)
    env["RODC_HOME"] = str(tmp_path)
    env["PYTHONPATH"] = os.pathsep.join(
        [str(tmp_path), REPO_ROOT, env.get("PYTHONPATH", "")]
    )
    env.setdefault("JAX_PLATFORMS", "cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, name)],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, (name, proc.stdout[-2000:], proc.stderr[-2000:])
    return proc.stdout + proc.stderr


def test_run_loading_file_list_main(cli_home):
    out = _run_script("run_loading_file_list.py", cli_home)
    assert "discovered 7 files" in out


def test_run_loading_dataset_main(cli_home):
    out = _run_script("run_loading_dataset.py", cli_home)
    # the loader pools both classes of the tiny corpus into a dataset
    assert "7" in out or "dataset" in out.lower()


def test_run_inference_visual_opencv_main(cli_home):
    # now executable in this env: the in-repo Viola-Jones evaluator
    # (ops/viola_jones.py) backs InferenceOCVApp when cv2 lacks objdetect
    import pytest

    from rapidobjectdetectionusingcascadedcnns_tpu.ops import viola_jones

    if viola_jones.default_cascade_path() is None:
        pytest.skip("no pretrained haar XML findable")
    out = _run_script("run_inference_visual_opencv.py", cli_home)
    assert "Traceback" not in out


def test_run_remove_all_broken_images_main(cli_home):
    tmp_path, root = cli_home
    # plant one unreadable image file
    broken = root / "testset" / "background" / "broken.png"
    broken.write_bytes(b"this is not a png")
    out = _run_script("run_remove_all_broken_images.py", cli_home)
    assert "1 broken images moved to ignore lists" in out
