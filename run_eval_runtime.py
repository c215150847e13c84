#!/usr/bin/env python3
"""Runtime benchmark cascade vs single (reference run_eval_runtime.py).

The reference compares {cascade, single} x {GPU, CPU}
(app/evaluate_runtime_app.py:50-55); the TPU-native analog compares the
accelerator backend against the host CPU when an accelerator is present.
"""
from rapidobjectdetectionusingcascadedcnns_tpu.apps.evaluate_runtime import (
    EvaluateRuntimeApp,
)
from rapidobjectdetectionusingcascadedcnns_tpu.utils import device

if __name__ == "__main__":
    platform = device.current_platform()
    platforms = [platform, "cpu"] if platform != "cpu" else None
    EvaluateRuntimeApp(None, None, 80, 20, compare_platforms=platforms)
