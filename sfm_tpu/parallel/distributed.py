"""Multi-host initialization.

Single-host multi-chip needs nothing: ``data_mesh()`` over ``jax.devices()``.
Across hosts, call :func:`initialize_multihost` once per process before any
jax computation; afterwards ``jax.devices()`` spans the whole pod slice and
the same mesh/shard_map code paths (ba.sharded, mvs.expand) run unchanged —
psum/all-gather ride ICI within a slice and DCN across slices, with no
NCCL/MPI analogue to manage (the reference has no distributed backend at
all; SURVEY.md §5).

This module is exercised for real only on multi-host pods; CI covers the
single-process path and argument plumbing.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize jax.distributed (no-op for a single process).

    With no arguments, relies on the TPU environment's auto-discovery
    (JAX reads the pod metadata).  Returns a summary dict.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
