"""On-device NMS serving tail: device clustering == host clustering."""

import numpy as np

from rapidobjectdetectionusingcascadedcnns_tpu import config as cf
from rapidobjectdetectionusingcascadedcnns_tpu.data import synthetic
from rapidobjectdetectionusingcascadedcnns_tpu.models import cascade


def _boxes_set(res):
    return sorted(map(tuple, np.asarray(res.boxes, np.int64).tolist()))


def test_device_nms_matches_host_nms():
    cf.set("conv_filter_sizes", [8])
    cf.set("fc1_size", 32)
    cf.set("compute_dtype", "float32")
    cf.set("nms", cf.NMS_OPENCV)
    cf.set("nms_opencv_min_neighbors", 1)
    model = cascade.build_cascade_model(seed=0)
    scene = synthetic.make_scene(100, 100, n_faces=1, seed=3, min_face=40, max_face=60)
    det = cascade.CascadeDetector(model)

    cf.set("nms_on_device", False)
    host = det.detect(scene.image)
    cf.set("nms_on_device", True)
    device = det.detect(scene.image)

    # same surviving raw windows feed both paths
    np.testing.assert_array_equal(host.raw_boxes, device.raw_boxes)
    assert _boxes_set(host) == _boxes_set(device)
    np.testing.assert_allclose(
        np.sort(host.confidences), np.sort(device.confidences)
    )


def test_device_nms_with_vertical_enlarge():
    cf.set("conv_filter_sizes", [8])
    cf.set("fc1_size", 32)
    cf.set("compute_dtype", "float32")
    cf.set("nms", cf.NMS_OPENCV)
    cf.set("nms_opencv_min_neighbors", 0)
    cf.set("vertically_enlarge_bboxes", True)
    model = cascade.build_cascade_model(seed=0)
    scene = synthetic.make_scene(100, 100, n_faces=1, seed=5, min_face=40, max_face=50)
    det = cascade.CascadeDetector(model)

    cf.set("nms_on_device", False)
    host = det.detect(scene.image)
    cf.set("nms_on_device", True)
    device = det.detect(scene.image)
    assert len(host.boxes) == len(device.boxes)
    np.testing.assert_allclose(
        np.sort(host.boxes, axis=0), np.sort(device.boxes, axis=0), atol=1e-6
    )
