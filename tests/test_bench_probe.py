"""bench.py liveness-probe contract: when the TPU tunnel is dead, the bench
must emit exactly one explicit-error JSON line and exit nonzero instead of
blocking inside backend init for the driver's whole bench window (the relay
wedge observed live in round 4: ``jax.devices()`` unkillably blocked for
45+ minutes — the probe runs in a subprocess precisely so a deadline stays
enforceable)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _import_bench():
    sys.path.insert(0, REPO)
    try:
        import bench
    finally:
        sys.path.pop(0)
    return bench


def test_dead_backend_emits_error_json_and_exits_nonzero(monkeypatch, capsys):
    bench = _import_bench()
    monkeypatch.setattr(bench, "_backend_alive", lambda deadline_s=None: False)
    # retries are for the real driver run (round 5: outages are transient);
    # the contract under test is the eventual error JSON, not the waiting
    monkeypatch.setattr(bench, "PROBE_RETRY_WINDOW_S", 0)
    monkeypatch.delenv("RODC_BENCH_NO_PROBE", raising=False)
    with pytest.raises(SystemExit) as exc:
        bench.main()
    assert exc.value.code == 1
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 1, "bench stdout must carry exactly one JSON line"
    out = json.loads(lines[0])
    assert out["metric"] == "vga_frames_per_sec_per_chip"
    assert out["value"] == 0.0
    assert out["vs_baseline"] == 0.0
    assert "unreachable" in out["error"]


def test_probe_subprocess_succeeds_on_live_cpu_backend():
    # sanitized env (no axon site hook) == the conftest CPU recipe; a live
    # backend must pass the probe well inside the deadline
    bench = _import_bench()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-c", bench._PROBE_SRC],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        env=env,
        timeout=bench.PROBE_DEADLINE_S,
    )
    assert proc.returncode == 0 and b"probe-ok" in proc.stdout, proc.stdout[-2000:]
