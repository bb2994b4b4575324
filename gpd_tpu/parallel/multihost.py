"""Multi-host (multi-process) execution support.

The reference is strictly single-process (SURVEY.md §2: its only MPI
artifact is an unused mpi4py smoke test). The TPU framework scales across
hosts with ``jax.distributed`` + XLA collectives over ICI/DCN:

  - detection: every host holds the (replicated) cloud; the global sample
    axis shards across all devices of all hosts (gpd_tpu.parallel.sharded);
    all-gather of survivors + global top-k ride the interconnect.
  - CEM: the accumulated mixture centers are gathered across hosts each
    round (the psum-of-sufficient-statistics step).
  - data generation / training: (object, view) work items and batches shard
    by process index (gpd_tpu.datagen.DataGenerator.generate accepts
    process_index/process_count); each host writes its own HDF5 shard.

Failure semantics follow jax.distributed: a lost host aborts the step; data
generation resumes from its per-shard journal (gpd_tpu.datagen), giving
checkpointed batch jobs rather than elastic recovery.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed from args or the standard environment
    variables (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID,
    or a TPU pod's automatic configuration)."""
    kwargs = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = (
            coordinator_address or os.environ["JAX_COORDINATOR_ADDRESS"])
    if num_processes or os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(
            num_processes or os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(
            process_id if process_id is not None
            else os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)


def process_info():
    """(process_index, process_count, local_device_count)."""
    return (jax.process_index(), jax.process_count(),
            jax.local_device_count())


def shard_work(items, process_index: Optional[int] = None,
               process_count: Optional[int] = None):
    """Round-robin shard a host-side work list across processes."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return [x for i, x in enumerate(items) if i % pc == pi]
