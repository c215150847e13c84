"""Config system semantics (key-compatible with the reference flag system)."""

import pytest

from rapidobjectdetectionusingcascadedcnns_tpu import config as cf


def test_get_set_reset():
    original = cf.get("batch_size")
    cf.set("batch_size", 99)
    assert cf.get("batch_size") == 99
    cf.reset()
    assert cf.get("batch_size") == original


def test_learning_rate_min_hook():
    # derived value refreshes on set (reference config.py:610-612)
    cf.set("learning_rate_init", 0.2)
    assert cf.get("learning_rate_min") == pytest.approx(0.02)


def test_timeout_seconds_hook():
    cf.set("timeout_minutes", 2)
    assert cf.get("timeout_seconds") == 120


def test_debug_mode_overrides():
    # reference config.py:555-560
    cf.set("debug", True)
    assert cf.get("class_min_images") == 100
    assert cf.get("class_max_images") == 100
    assert cf.get("epochs_total") == 3


def test_overrides_context_manager():
    before = cf.get("img_width")
    with cf.overrides(img_width=96, brand_new_key=1):
        assert cf.get("img_width") == 96
        assert cf.get("brand_new_key") == 1
    assert cf.get("img_width") == before
    assert not cf.has("brand_new_key")


def test_snapshot_restore_roundtrip():
    snap = cf.snapshot()
    cf.set("momentum", 0.123)
    cf.restore(snap)
    assert cf.get("momentum") != 0.123 or snap["momentum"] == 0.123


def test_path_derivation_follows_root():
    cf.set("project_extension_root", "/tmp/some_root")
    assert cf.get("output_root_dir") == "/tmp/some_root/output"
    assert cf.get("snapshot_dir").startswith("/tmp/some_root/output")


def test_session_keys_unique():
    a = cf.get("session_key")
    cf.reset()
    assert cf.get("session_key") != a
