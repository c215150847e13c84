"""Worker process for the multi-host rehearsal.

Launched by tests/test_multihost.py (2 processes x 4 virtual CPU devices) or
manually:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4 \
    python tools/multihost_worker.py <process_id> <num_processes> <port>

Prints one `RESULT {json}` line with the rehearsal outcome.
"""

import json
import os
import sys


def main() -> None:
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = sys.argv[3]

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address="localhost:{}".format(port),
        num_processes=num_processes,
        process_id=process_id,
    )

    from rapidobjectdetectionusingcascadedcnns_tpu.parallel import multihost

    result = multihost.rehearsal(global_batch=32, seed=0)
    print("RESULT " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
