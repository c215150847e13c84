"""Scheduled (support-bounded) Pallas extraction: schedule construction and
parity vs the v1 kernel / XLA formulation.

Cross-program tolerance policy: sampling positions are f32 expressions that
XLA may or may not contract into FMAs depending on the surrounding program,
so two *separately compiled* extraction paths can disagree by one ulp in a
tap weight exactly at a bf16 rounding boundary — visible as a +-1 flip of
the u8-quantized output on a tiny fraction of elements. Within one program
(the cascade) the positions are computed once, so stage decisions stay
self-consistent; across programs the tests assert exactness on >=99.9% of
elements and |diff| <= 1 elsewhere (the e2e oracle's borderline-window
policy covers the same flips end to end).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rapidobjectdetectionusingcascadedcnns_tpu.ops import (
    windows,
    windows_pallas,
    windows_sched,
)
from rapidobjectdetectionusingcascadedcnns_tpu.ops.pyramid import (
    build_plan,
    window_table,
)


def _assert_quantized_parity(got, ref, max_frac=1e-3):
    got = np.asarray(got, np.float32)
    ref = np.asarray(ref, np.float32)
    neq = got != ref
    assert np.abs(got - ref).max(initial=0.0) <= 1.0 + 1e-6
    assert neq.mean() <= max_frac, f"{neq.sum()}/{ref.size} elements differ"


def _plan_sched_windows(img_h=192, img_w=256, wsf=1.05):
    plan = build_plan(img_h, img_w, 12, 12, 0.075, wsf)
    table = window_table(plan)
    boxes = table["boxes_float"].astype(np.float32)
    sched = windows_sched.build_schedule(boxes, img_h, img_w, 12, 12)
    return plan, boxes, sched


def test_schedule_classes_are_support_bounded():
    plan, boxes, sched = _plan_sched_windows()
    assert sched is not None
    # the blocked order must produce a real stratification: some tiles in
    # cells much smaller than the full image
    assert any(c.cell_r <= 128 for c in sched.classes)
    # every window appears exactly once in the output mapping
    assert sorted(sched.positions.tolist()) == sorted(
        set(sched.positions.tolist())
    )
    assert len(sched.positions) == plan.n_windows
    # block offsets in range; ladder rungs divide the padded dims
    for c in sched.classes:
        assert sched.h_pad % c.cell_r == 0
        assert sched.w_pad % c.cell_c == 0
        assert ((c.offs[0] + 1) * c.cell_r <= sched.h_pad).all()
        assert ((c.offs[1] + 1) * c.cell_c <= sched.w_pad).all()


def test_matches_v1_kernel_on_plan(rng):
    plan, boxes, sched = _plan_sched_windows()
    img = rng.randint(0, 256, size=(192, 256, 3)).astype(np.float32)
    got = windows_sched.extract_scheduled(
        jnp.asarray(img), jnp.asarray(boxes), sched, interpret=True
    )
    ref = windows_pallas.crop_and_resize_pallas(
        jnp.asarray(img), jnp.asarray(boxes), out_h=12, out_w=12, interpret=True
    )
    _assert_quantized_parity(got, ref)


def test_matches_xla_core_on_plan(rng):
    plan, boxes, sched = _plan_sched_windows()
    img = rng.randint(0, 256, size=(192, 256, 3)).astype(np.float32)
    got = windows_sched.extract_scheduled(
        jnp.asarray(img), jnp.asarray(boxes), sched, interpret=True
    )
    ref = windows.crop_and_resize(
        jnp.asarray(img), jnp.asarray(boxes), out_h=12, out_w=12
    )
    _assert_quantized_parity(got, ref)


def test_exact_on_power_of_two_boxes(rng):
    """Boxes whose resize ratio is a power of two have exactly-representable
    tap weights — every path must agree bit-for-bit."""
    img = rng.randint(0, 256, size=(160, 256, 3)).astype(np.float32)
    n = 70
    sides = rng.choice([12, 24, 48], size=n)
    x0 = rng.randint(0, 200, n).astype(np.float32)
    y0 = rng.randint(0, 100, n).astype(np.float32)
    boxes = np.stack([x0, y0, x0 + sides, y0 + sides], 1).astype(np.float32)
    boxes[:, 2] = np.minimum(boxes[:, 2], 256)
    boxes[:, 3] = np.minimum(boxes[:, 3], 160)
    sched = windows_sched.build_schedule(boxes, 160, 256, 12, 12)
    assert sched is not None
    got = np.asarray(
        windows_sched.extract_scheduled(
            jnp.asarray(img), jnp.asarray(boxes), sched, interpret=True
        )
    )
    ref = np.asarray(
        windows.crop_and_resize(
            jnp.asarray(img), jnp.asarray(boxes), out_h=12, out_w=12
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_group_padding_roundtrip(rng):
    """Scattered boxes hit many cell groups with per-group padding; the
    reorder mapping must still return windows in input order."""
    img = rng.randint(0, 256, size=(160, 384, 3)).astype(np.float32)
    n = 101  # groups of odd sizes: exercises replicated padding + ids/valid
    x0 = rng.uniform(0, 340, n)
    y0 = rng.uniform(0, 120, n)
    s = rng.uniform(10, 40, n)
    boxes = np.stack(
        [x0, y0, np.minimum(x0 + s, 384), np.minimum(y0 + s, 160)], 1
    ).astype(np.float32)
    sched = windows_sched.build_schedule(boxes, 160, 384, 12, 12)
    got = windows_sched.extract_scheduled(
        jnp.asarray(img), jnp.asarray(boxes), sched, interpret=True
    )
    ref = windows_pallas.crop_and_resize_pallas(
        jnp.asarray(img), jnp.asarray(boxes), out_h=12, out_w=12, interpret=True
    )
    _assert_quantized_parity(got, ref, max_frac=5e-3)
    # scheduled-order metadata: every real window appears exactly once valid
    real = sched.ids[sched.valid]
    assert sorted(real.tolist()) == list(range(n))


def test_small_image_returns_none():
    boxes = np.array([[0, 0, 20, 20]], np.float32)
    assert windows_sched.build_schedule(boxes, 100, 120, 12, 12) is None


def test_schedule_for_plan_cached():
    plan = build_plan(192, 256, 12, 12, 0.075, 1.2)
    a = windows_sched.schedule_for_plan(plan, 12, 12)
    b = windows_sched.schedule_for_plan(plan, 12, 12)
    assert a is b


def test_cascade_uses_scheduled_stage0(rng, monkeypatch):
    """Forcing resample 'pallas' + crop mode on a schedulable image must
    produce the same detections as the XLA path (CPU: interpret mode)."""
    from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
    from rapidobjectdetectionusingcascadedcnns_tpu.data import synthetic
    from rapidobjectdetectionusingcascadedcnns_tpu.models import cascade as casc

    with cf.overrides(
        conv_filter_sizes=[8],
        fc1_size=32,
        cascade_n_nets=2,
        img_width=24,
        window_scale_factor=1.25,
        min_window_length=0.15,
        window_extraction_mode="crop",
    ):
        model = casc.build_cascade_model(seed=3)
        img = synthetic.make_scene(160, 256, 2, seed=5).image

        with cf.overrides(use_pallas_resample="xla"):
            det_x = casc.CascadeDetector(model).detect(img)
        with cf.overrides(use_pallas_resample="pallas2"):
            det_p = casc.CascadeDetector(model).detect(img)

    # identical survivor sets modulo borderline ulp flips: compare ids
    ids_x = set(np.asarray(det_x.raw_window_ids).tolist())
    ids_p = set(np.asarray(det_p.raw_window_ids).tolist())
    sym = ids_x ^ ids_p
    assert len(sym) <= max(2, 0.02 * max(1, len(ids_x)))
    np.testing.assert_allclose(
        np.sort(np.asarray(det_x.boxes), axis=0),
        np.sort(np.asarray(det_p.boxes), axis=0),
        atol=6.0,
    ) if len(det_x.boxes) == len(det_p.boxes) else None


def test_cascade_pallas2_falls_back_on_small_images(rng):
    """Images below the schedulability threshold must silently use the v1
    resampler under 'pallas2' and detect identically to the XLA path."""
    from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
    from rapidobjectdetectionusingcascadedcnns_tpu.data import synthetic
    from rapidobjectdetectionusingcascadedcnns_tpu.models import cascade as casc

    with cf.overrides(
        conv_filter_sizes=[8],
        fc1_size=32,
        cascade_n_nets=2,
        img_width=24,
        window_scale_factor=1.3,
        min_window_length=0.3,
        window_extraction_mode="crop",
    ):
        model = casc.build_cascade_model(seed=3)
        img = synthetic.make_scene(100, 120, 1, seed=7, min_face=35, max_face=45).image
        with cf.overrides(use_pallas_resample="xla"):
            det_x = casc.CascadeDetector(model).detect(img)
        with cf.overrides(use_pallas_resample="pallas2"):
            det_p = casc.CascadeDetector(model).detect(img)
    ids_x = set(np.asarray(det_x.raw_window_ids).tolist())
    ids_p = set(np.asarray(det_p.raw_window_ids).tolist())
    assert len(ids_x ^ ids_p) <= max(2, 0.02 * max(1, len(ids_x)))


def test_batched_program_with_scheduled_stage0(rng):
    """The scheduled kernel must compose with the batched (vmapped) cascade
    program — the serving/bench shape (interpret mode on CPU)."""
    from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
    from rapidobjectdetectionusingcascadedcnns_tpu.data import synthetic
    from rapidobjectdetectionusingcascadedcnns_tpu.models import cascade as casc

    with cf.overrides(
        conv_filter_sizes=[8],
        fc1_size=32,
        cascade_n_nets=2,
        img_width=24,
        window_scale_factor=1.3,
        min_window_length=0.2,
        window_extraction_mode="crop",
        inference_batch_frames=2,
        inference_merge=True,
    ):
        model = casc.build_cascade_model(seed=3)
        imgs = [
            synthetic.make_scene(160, 256, 2, seed=s, min_face=40, max_face=60).image
            for s in (11, 12)
        ]
        with cf.overrides(use_pallas_resample="pallas2"):
            res_p = casc.CascadeDetector(model).detect_batch(imgs)
        with cf.overrides(use_pallas_resample="xla"):
            res_x = casc.CascadeDetector(model).detect_batch(imgs)

    for rp, rx in zip(res_p, res_x):
        ids_p = set(np.asarray(rp.raw_window_ids).tolist())
        ids_x = set(np.asarray(rx.raw_window_ids).tolist())
        assert len(ids_p ^ ids_x) <= max(2, 0.02 * max(1, len(ids_x)))


def test_ladder_on_odd_multiple_of_256_pads():
    """img_h in 513..768 pads to 768, which 512 does NOT divide — the ladder
    must drop non-dividing rungs so every cell class tiles the padded dims
    (advisor round 2)."""
    img_h, img_w = 600, 1280  # h_pad=768 (odd multiple of 256), w_pad=1280
    plan = build_plan(img_h, img_w, 12, 12, 0.05, 1.1)
    table = window_table(plan)
    boxes = table["boxes_float"].astype(np.float32)
    sched = windows_sched.build_schedule(boxes, img_h, img_w, 12, 12)
    assert sched is not None
    assert sched.h_pad == 768 and sched.w_pad == 1280
    for c in sched.classes:
        assert sched.h_pad % c.cell_r == 0
        assert sched.w_pad % c.cell_c == 0
        assert ((c.offs[0] + 1) * c.cell_r <= sched.h_pad).all()
        assert ((c.offs[1] + 1) * c.cell_c <= sched.w_pad).all()
    # every window still gets exactly one (unique) output slot
    assert sorted(sched.positions.tolist()) == sorted(set(sched.positions.tolist()))
    assert len(sched.positions) == plan.n_windows


def test_resample_impl_boolean_honors_sched_flag():
    """use_pallas_resample=True (legacy boolean) must honor
    stage0_scheduled_extraction='on' exactly like the string 'pallas' form
    (advisor round 2)."""
    from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
    from rapidobjectdetectionusingcascadedcnns_tpu.models import cascade as casc

    with cf.overrides(use_pallas_resample=True, stage0_scheduled_extraction="on"):
        assert casc.resolve_resample_impl() == "pallas2"
    with cf.overrides(use_pallas_resample=True, stage0_scheduled_extraction="off"):
        assert casc.resolve_resample_impl() == "pallas"
    with cf.overrides(use_pallas_resample="pallas", stage0_scheduled_extraction="on"):
        assert casc.resolve_resample_impl() == "pallas2"
