"""YUV420 ingress format."""

import jax.numpy as jnp
import numpy as np

from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
from rapidobjectdetectionusingcascadedcnns_tpu.data import synthetic
from rapidobjectdetectionusingcascadedcnns_tpu.models import cascade
from rapidobjectdetectionusingcascadedcnns_tpu.ops import color


def test_yuv_roundtrip_close():
    # realistic images have smooth chroma; per-pixel random noise would be
    # (legitimately) destroyed by the 2x2 chroma subsampling
    rgb = synthetic.make_scene(64, 64, n_faces=1, seed=1, min_face=40, max_face=50).image
    y, uv = color.rgb_to_yuv420(rgb)
    assert y.shape == (64, 64) and uv.shape == (32, 32, 2)
    back = np.asarray(color.yuv420_to_rgb(jnp.asarray(y), jnp.asarray(uv)))
    assert np.abs(back - rgb.astype(np.float32)).mean() < 6.0


def test_yuv_roundtrip_exact_on_flat_colors():
    rgb = np.zeros((16, 16, 3), np.uint8)
    rgb[:, :, 0] = 200
    rgb[:, :, 1] = 120
    rgb[:, :, 2] = 60
    y, uv = color.rgb_to_yuv420(rgb)
    back = np.asarray(color.yuv420_to_rgb(jnp.asarray(y), jnp.asarray(uv)))
    assert np.abs(back - rgb.astype(np.float32)).max() < 2.0


def test_up2_matches_jax_image_resize():
    # the manual static-slice lerp upsample must reproduce
    # jax.image.resize(method="bilinear", antialias=False) exactly at 2x
    import jax

    rng = np.random.default_rng(7)
    for h, w in ((6, 10), (32, 17), (45, 45)):
        uv = rng.integers(0, 256, size=(h, w, 2)).astype(np.float32)
        ref = np.asarray(
            jax.image.resize(
                jnp.asarray(uv), (2 * h, 2 * w, 2), method="bilinear", antialias=False
            )
        )
        alt = np.asarray(color._up2(color._up2(jnp.asarray(uv), 0), 1))
        assert np.array_equal(ref, alt), (h, w, np.abs(ref - alt).max())


def test_detect_batch_yuv420_matches_rgb():
    cf.set("conv_filter_sizes", [8])
    cf.set("fc1_size", 32)
    cf.set("compute_dtype", "float32")
    cf.set("nms", cf.NMS_DISABLED)
    model = cascade.build_cascade_model(seed=0)
    det = cascade.CascadeDetector(model)
    scene = synthetic.make_scene(100, 100, n_faces=1, seed=3, min_face=40, max_face=60)

    rgb_res = det.detect(scene.image)
    yuv_res = det.detect_batch_yuv420([color.rgb_to_yuv420(scene.image)])[0]

    assert yuv_res.n_windows == rgb_res.n_windows
    set_r = set(map(tuple, rgb_res.raw_boxes.tolist()))
    set_y = set(map(tuple, yuv_res.raw_boxes.tolist()))
    inter = len(set_r & set_y)
    union = max(len(set_r | set_y), 1)
    # random model => many near-threshold windows; chroma subsampling flips some
    assert inter / union > 0.7, (len(set_r), len(set_y), inter)
