#!/usr/bin/env python3
"""Runtime benchmark cascade vs single (reference run_eval_runtime.py)."""
from rapidobjectdetectionusingcascadedcnns_tpu.apps.evaluate_runtime import (
    EvaluateRuntimeApp,
)

if __name__ == "__main__":
    EvaluateRuntimeApp(None, None, 80, 20)
