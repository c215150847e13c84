"""Multi-host rehearsal: 2 processes x 4 virtual CPU devices drive the SAME
data-parallel train step through jax.distributed + per-host shard feeding
(jax.make_array_from_process_local_data), and must agree with each other and
with a single-process 8-device run of the same global batch."""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env() -> dict:
    env = dict(os.environ)
    # force the CPU backend with 4 virtual devices per process; drop the
    # image's tunneled-TPU site hook (PYTHONPATH) and its platform pin
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = REPO
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    return env


@pytest.mark.slow
def test_two_process_rehearsal_matches_single_process():
    port = _free_port()
    env = _worker_env()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    results = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, (out, err[-2000:])
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, (out, err[-2000:])
        results.append(json.loads(lines[-1][len("RESULT ") :]))

    a, b = results
    assert {a["process_index"], b["process_index"]} == {0, 1}
    for r in results:
        assert r["process_count"] == 2
        assert r["global_devices"] == 8
        assert r["local_devices"] == 4
        assert r["eval_total"] == 32
        assert r["host_corpus_len"] == 50  # strided 100-item corpus over 2 hosts
    # both processes computed the same global loss
    assert a["loss"] == pytest.approx(b["loss"], rel=0, abs=0)

    # single-process ground truth on the identical global batch
    from rapidobjectdetectionusingcascadedcnns_tpu.parallel import multihost

    single = multihost.rehearsal(global_batch=32, seed=0)
    assert single["process_count"] == 1
    assert single["eval_total"] == 32
    assert a["loss"] == pytest.approx(single["loss"], rel=2e-6)


@pytest.mark.slow
def test_two_process_training_workflow_with_checkpoint(tmp_path):
    """The FULL workflow over 2 processes: multi-epoch Trainer.train() on the
    global mesh, checkpoint export on process 0, restore on both processes,
    identical post-restore eval everywhere (verdict r2 item 7)."""
    port = _free_port()
    env = _worker_env()
    work_dir = str(tmp_path / "mh_workflow")
    os.makedirs(work_dir, exist_ok=True)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), "workflow", work_dir],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    results = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, (out, err[-2000:])
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, (out, err[-2000:])
        results.append(json.loads(lines[-1][len("RESULT ") :]))

    a, b = results
    assert {a["process_index"], b["process_index"]} == {0, 1}
    for r in results:
        assert r["process_count"] == 2
        assert r["epochs"] == 2
        assert r["iterations_total"] >= 2  # a real multi-batch loop ran
        # the restored model evaluates exactly like the trained one
        assert r["post_restore_counts"] == r["pre_eval_counts"]
        assert os.path.exists(r["checkpoint"])
    # both processes agree on everything observable
    assert a["pre_eval_counts"] == b["pre_eval_counts"]
    assert a["post_restore_counts"] == b["post_restore_counts"]
    assert a["final_loss"] == pytest.approx(b["final_loss"], rel=0, abs=0)
    assert a["checkpoint"] == b["checkpoint"]
