"""Multi-host runtime initialization.

No reference counterpart. Wraps ``jax.distributed.initialize`` so multi-host
SPMD jobs (one process per host, devices glued into one global mesh) can be
launched from the same CLI; on a single host this is a no-op.
"""
import os
from typing import Optional

import jax

__all__ = ["initialize_distributed", "is_multi_host", "process_index"]


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialize the multi-host runtime if requested via args or the
    standard env vars (JAX_COORDINATOR_ADDRESS etc.). Safe to call on a
    single host (no-op)."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1")),
        process_id=process_id or int(os.environ.get("JAX_PROCESS_ID", "0")))


def is_multi_host() -> bool:
    return jax.process_count() > 1


def process_index() -> int:
    return jax.process_index()


def global_batch_from_local(sharding, local_rows):
    """Assemble a global device array from this process's local rows — the
    multi-host input-pipeline building block (each host loads only its slice
    of the epoch; `jax.make_array_from_process_local_data` glues the shards
    into one global array for the pjit'd step). Validated by
    tests/test_multiprocess.py with two real processes."""
    return jax.make_array_from_process_local_data(sharding, local_rows)
