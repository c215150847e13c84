"""Online augmentation semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from rapidobjectdetectionusingcascadedcnns_tpu.ops import augment


def _acfg(**kw):
    defaults = dict(
        horizontal_flip=False,
        vertical_flip=False,
        allow_vertical_flip_foreground=False,
        rotation_mode="DAO_ROTATION_MODE_DISABLED",
        max_rotation_angle=0.0,
        max_foreground_rotation_angle=0.0,
        crop_probability=0.0,
        crop_min_percent=0.9,
        color_distortion=False,
        color_fast_mode=False,
    )
    defaults.update(kw)
    return augment.AugmentConfig(**defaults)


def _batch(rng, n=8, size=16):
    imgs = jnp.asarray(rng.rand(n, size, size, 3).astype(np.float32) * 2 - 1)
    labels = jnp.asarray((np.arange(n) % 2).astype(np.int32))
    return imgs, labels


def test_identity_config_is_noop(rng):
    imgs, labels = _batch(rng)
    out = augment.augment_batch(jax.random.PRNGKey(0), imgs, labels, _acfg())
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-5)


def test_horizontal_flip_produces_mirrors(rng):
    imgs, labels = _batch(rng, n=32)
    out = augment.augment_batch(
        jax.random.PRNGKey(1), imgs, labels, _acfg(horizontal_flip=True)
    )
    out = np.asarray(out)
    ref = np.asarray(imgs)
    flipped = identical = 0
    for i in range(len(ref)):
        # tf-style flip maps x_in = width - x_out => column w-1 lands OOB(0);
        # compare the valid region
        if np.allclose(out[i], ref[i], atol=1e-4):
            identical += 1
        elif np.allclose(out[i][:, 1:], ref[i][:, -1:0:-1], atol=1e-4):
            flipped += 1
    assert identical + flipped == len(ref)
    assert flipped > 0 and identical > 0  # coin is ~fair


def test_vertical_flip_exempts_foreground(rng):
    imgs, labels = _batch(rng, n=64)
    out = np.asarray(
        augment.augment_batch(
            jax.random.PRNGKey(2),
            imgs,
            labels,
            _acfg(vertical_flip=True, allow_vertical_flip_foreground=False),
        )
    )
    ref = np.asarray(imgs)
    fg = np.asarray(labels).astype(bool)
    for i in np.where(fg)[0]:
        np.testing.assert_allclose(out[i], ref[i], atol=1e-4)
    changed_bg = sum(
        not np.allclose(out[i], ref[i], atol=1e-4) for i in np.where(~fg)[0]
    )
    assert changed_bg > 0


def test_rotation_90_exempts_foreground(rng):
    imgs, labels = _batch(rng, n=64)
    out = np.asarray(
        augment.augment_batch(
            jax.random.PRNGKey(3),
            imgs,
            labels,
            _acfg(rotation_mode="DAO_ROTATION_MODE_90"),
        )
    )
    ref = np.asarray(imgs)
    fg = np.asarray(labels).astype(bool)
    for i in np.where(fg)[0]:
        np.testing.assert_allclose(out[i], ref[i], atol=1e-4)
    changed_bg = sum(
        not np.allclose(out[i], ref[i], atol=1e-4) for i in np.where(~fg)[0]
    )
    assert changed_bg > 0


def test_continuous_rotation_separate_fg_angle(rng):
    imgs, labels = _batch(rng, n=32)
    out = np.asarray(
        augment.augment_batch(
            jax.random.PRNGKey(4),
            imgs,
            labels,
            _acfg(
                rotation_mode="DAO_ROTATION_MODE_CONTINUOUS",
                max_rotation_angle=45.0,
                max_foreground_rotation_angle=0.0,
            ),
        )
    )
    ref = np.asarray(imgs)
    fg = np.asarray(labels).astype(bool)
    # fg angle 0 => unchanged; bg rotated
    for i in np.where(fg)[0]:
        np.testing.assert_allclose(out[i], ref[i], atol=1e-3)
    changed_bg = sum(
        not np.allclose(out[i], ref[i], atol=1e-3) for i in np.where(~fg)[0]
    )
    assert changed_bg > len(np.where(~fg)[0]) // 2


def test_crop_zooms_in(rng):
    imgs, labels = _batch(rng, n=16)
    out = np.asarray(
        augment.augment_batch(
            jax.random.PRNGKey(5),
            imgs,
            labels,
            _acfg(crop_probability=1.0, crop_min_percent=0.5, crop_max_percent=0.5),
        )
    )
    assert out.shape == imgs.shape
    assert np.isfinite(out).all()
    assert not np.allclose(out, np.asarray(imgs), atol=1e-4)


def test_color_distortion_stays_in_range(rng):
    imgs, labels = _batch(rng, n=8)
    out = np.asarray(
        augment.augment_batch(
            jax.random.PRNGKey(6), imgs, labels, _acfg(color_distortion=True)
        )
    )
    # the [-1,1]->[0,1]->distort->clip->[-1,1] shimmy bounds the output
    assert out.min() >= -1.0 - 1e-5
    assert out.max() <= 1.0 + 1e-5


def test_hsv_roundtrip(rng):
    rgb = jnp.asarray(rng.rand(5, 4, 4, 3).astype(np.float32))
    back = augment._hsv_to_rgb(augment._rgb_to_hsv(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-5)


def test_deterministic_given_key(rng):
    imgs, labels = _batch(rng)
    acfg = _acfg(horizontal_flip=True, color_distortion=True, crop_probability=0.5)
    a = augment.augment_batch(jax.random.PRNGKey(7), imgs, labels, acfg)
    b = augment.augment_batch(jax.random.PRNGKey(7), imgs, labels, acfg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = augment.augment_batch(jax.random.PRNGKey(8), imgs, labels, acfg)
    assert not np.allclose(np.asarray(a), np.asarray(c))
