#!/usr/bin/env python3
"""Convert pretrained InceptionV3 weights for the cascade's inception stage.

The reference downloads the frozen Inception-2015 graph and taps pool_3
(network/inception_builder.py:39-65). The TPU-native equivalent: take real
pretrained InceptionV3 weights in the torchvision state-dict layout —
a ``torch.save``d state dict (.pth) or an .npz of the same tensors — fold
the batch norms, and emit the backbone .npz that
``cf.set("inception_weights_path", ...)`` loads (models/inception.py).

Usage:
    python tools/convert_inception.py <state_dict.pth|.npz> <out.npz>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_state_dict(path: str):
    if path.endswith(".npz"):
        with np.load(path) as data:
            return {k: data[k] for k in data.files}
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return {k: v for k, v in sd.items()}


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        raise SystemExit(2)
    src, dst = sys.argv[1], sys.argv[2]
    from rapidobjectdetectionusingcascadedcnns_tpu.models import inception_v3

    params = inception_v3.convert_torchvision_state_dict(load_state_dict(src))
    inception_v3.save_npz(dst, params)
    print(
        "converted {} convs / {:.1f}M folded parameters -> {}".format(
            len(params), inception_v3.n_params(params) / 1e6, dst
        )
    )
    print('use with: cf.set("inception_weights_path", {!r})'.format(dst))


if __name__ == "__main__":
    main()
