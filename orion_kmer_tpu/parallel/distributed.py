"""Multi-host initialization.

The reference is strictly single-host (SURVEY.md 2.3); scaling past one
host here means a JAX distributed runtime: each host process calls
jax.distributed.initialize() and the (shard,) mesh spans every chip in
the slice, with the all_to_all hash routing riding ICI within a slice
and DCN across hosts.  This helper wires the standard environment
contract (coordinator address / process count / process id) and is a
no-op on a single host.

Real multi-host hardware is not available in the round-1 environment;
the code path is exercised by the simulated-mesh tests and
dryrun_multichip.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger("orion_kmer_tpu.parallel.distributed")

_initialized = False


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed from env when configured; returns True
    if a multi-process runtime is active."""
    global _initialized
    if _initialized:
        return True
    coordinator = os.environ.get("ORION_KMER_COORDINATOR") or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if not coordinator:
        return False
    num_processes = int(
        os.environ.get("ORION_KMER_NUM_PROCESSES")
        or os.environ.get("JAX_NUM_PROCESSES", "1")
    )
    process_id = int(
        os.environ.get("ORION_KMER_PROCESS_ID") or os.environ.get("JAX_PROCESS_ID", "0")
    )
    if num_processes <= 1:
        return False
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    logger.info(
        "jax.distributed initialized: process %d/%d via %s",
        process_id,
        num_processes,
        coordinator,
    )
    return True
