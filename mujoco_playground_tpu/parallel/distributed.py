"""Multi-host initialization helpers.

On a pod slice, call :func:`initialize_distributed` once per host before any
jax computation; afterwards ``jax.devices()`` spans the slice and the 1-D env
mesh (parallel/mesh.py) covers all chips, with collectives riding ICI.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed if a multi-host env is detected/specified.

    Returns True if distributed mode was initialized.  On TPU pods the
    arguments are auto-detected from the metadata server; on CPU/GPU test
    rigs pass them explicitly (or set JAX_COORDINATOR_ADDRESS etc.).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        # Single-process (one host's chips only).
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    return True


def local_batch_slice(global_batch: int) -> slice:
    """This host's slice of a globally-sharded env batch."""
    n = jax.process_count()
    i = jax.process_index()
    per = global_batch // n
    return slice(i * per, (i + 1) * per)
