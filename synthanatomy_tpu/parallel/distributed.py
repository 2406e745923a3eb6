"""Multi-host initialization.

The TPU-native replacement for the reference's
``deepspeed.init_distributed(dist_backend="nccl",
auto_mpi_discovery=True)`` + RANK/LOCAL_RANK/WORLD_SIZE env plumbing
(reference run_vqvae.py:831-846, SURVEY.md §5.8): on multi-host TPU
slices ``jax.distributed.initialize()`` discovers the topology from the
TPU environment automatically; on manual clusters the standard JAX
coordinator envs are honoured.  Single-process runs are a no-op.
"""

from __future__ import annotations

import logging
import os

import jax

__all__ = ["maybe_initialize_distributed"]

_log = logging.getLogger(__name__)
_initialized = False


def maybe_initialize_distributed() -> bool:
    """Initialize the JAX distributed runtime when the environment
    indicates a multi-process job.  Returns True if running
    multi-process after the call."""
    global _initialized
    if _initialized:
        return jax.process_count() > 1

    multi_host_env = any(
        v in os.environ
        for v in (
            "JAX_COORDINATOR_ADDRESS",
            "COORDINATOR_ADDRESS",
            "MEGASCALE_COORDINATOR_ADDRESS",
            "TPU_WORKER_ID",
        )
    )
    if multi_host_env:
        try:
            # manual clusters: explicit coordinator/process env triple
            # (the reference's RANK/WORLD_SIZE convention, run_vqvae.py:
            # 840-846); TPU slices auto-discover with no-arg initialize
            kw = {}
            if "JAX_COORDINATOR_ADDRESS" in os.environ and (
                "JAX_NUM_PROCESSES" in os.environ
                and "JAX_PROCESS_ID" in os.environ
            ):
                kw = dict(
                    coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
                    num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                    process_id=int(os.environ["JAX_PROCESS_ID"]),
                )
            jax.distributed.initialize(**kw)
            _log.info(
                "jax.distributed initialized: process %d/%d",
                jax.process_index(),
                jax.process_count(),
            )
        except Exception as e:  # already initialized / single proc
            _log.warning("jax.distributed.initialize skipped: %s", e)
    _initialized = True
    return jax.process_count() > 1
