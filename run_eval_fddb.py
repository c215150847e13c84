#!/usr/bin/env python3
"""FDDB 10-fold benchmark (reference run_eval_fddb.py)."""
from rapidobjectdetectionusingcascadedcnns_tpu.apps.evaluate_fddb import (
    EvaluateFDDBApp,
)

if __name__ == "__main__":
    EvaluateFDDBApp()
