#!/usr/bin/env python3
"""Export a trained cascade checkpoint as an AOT serving bundle.

The analog of the reference's post-training graph-export pipeline
(app/train_app.py:177-227: freeze -> InferenceOptimizer -> final .pb): the
full jitted cascade program — weights, pyramid geometry, device-NMS tail —
is serialized via jax.export into a directory a serving host loads with
``serve.load_bundle`` (no model object, no config, no Python tracing).

Usage:
    python run_export_serving.py <model_dir> <session_key> <out_dir> \
        [--height 480] [--width 640] [--batch N] [--yuv] [--rungs 3]
"""

import argparse

from rapidobjectdetectionusingcascadedcnns_tpu import config as cf, serve
from rapidobjectdetectionusingcascadedcnns_tpu.train import checkpoint
from rapidobjectdetectionusingcascadedcnns_tpu.utils import log


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model_dir")
    p.add_argument("session_key")
    p.add_argument("out_dir")
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    p.add_argument(
        "--batch",
        default=None,
        help="frames per program call (int), or 'dynamic' for a symbolic batch dim",
    )
    p.add_argument("--yuv", action="store_true", help="export the YUV420 ingress program")
    p.add_argument("--rungs", type=int, default=3, help="capacity-escalation rungs to ship")
    p.add_argument(
        "--platform",
        default=None,
        help="lowering platform for the bundle (e.g. tpu, cpu); default: the current backend",
    )
    args = p.parse_args()

    log.set_echo(True)
    if args.platform:
        from rapidobjectdetectionusingcascadedcnns_tpu.utils import device

        device.force_platform(args.platform)
    model = checkpoint.load_cascade(args.model_dir, args.session_key)
    batch = args.batch if args.batch in (None, "dynamic") else int(args.batch)
    bundle = serve.export_detector(
        model,
        args.height,
        args.width,
        batch=batch,
        yuv=args.yuv,
        n_rungs=args.rungs,
    )
    serve.save_bundle(bundle, args.out_dir)
    log.log(
        "exported serving bundle to {} ({} rungs, capacities {}, platforms {})".format(
            args.out_dir,
            len(bundle.meta["capacity_rungs"]),
            bundle.meta["capacity_rungs"][0],
            bundle.meta["platforms"],
        )
    )


if __name__ == "__main__":
    main()
