"""Worker process for the multi-host rehearsals.

Launched by tests/test_multihost.py (2 processes x 4 virtual CPU devices) or
manually:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4 \
    python tools/multihost_worker.py <process_id> <num_processes> <port> \
        [step | workflow <work_dir>]

``step`` (default) runs one train+eval step (multihost.rehearsal);
``workflow`` runs the multi-epoch Trainer.train() + cross-process
checkpoint save/restore flow (multihost.workflow_rehearsal).
Prints one `RESULT {json}` line with the rehearsal outcome.
"""

import json
import os
import sys


def main() -> None:
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "step"

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address="localhost:{}".format(port),
        num_processes=num_processes,
        process_id=process_id,
    )

    from rapidobjectdetectionusingcascadedcnns_tpu.parallel import multihost

    if mode == "workflow":
        result = multihost.workflow_rehearsal(sys.argv[5], epochs=2, seed=0)
    else:
        result = multihost.rehearsal(global_batch=32, seed=0)
    print("RESULT " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
