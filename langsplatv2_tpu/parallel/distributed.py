"""Multi-host orchestration: process bootstrap + multi-host checkpointing.

The reference is strictly single-process (SURVEY.md §2.4 — no
torch.distributed anywhere); on TPU pods the runtime needs
`jax.distributed.initialize` before any device access so every host sees
the global device set, and checkpoint writes must be coordinated (one
writer, everyone synchronized). This module keeps both concerns in one
small, dependency-free place:

- `initialize_distributed()` — env-driven bootstrap (no-op for the common
  single-host case, so every entry point can call it unconditionally).
- `save_checkpoint_multihost()` — process-0-writes for replicated state
  (the framework's training state is replicated across data/tile shards;
  gaussian-sharded params are all-gathered first), with a host barrier so
  no process races ahead of the write.
- `sync_hosts()` — a named barrier built on a tiny psum across processes.
"""
from __future__ import annotations

import os

import jax
import numpy as np


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> bool:
    """Bootstrap multi-host JAX. Returns True when running multi-process.

    Resolution order: explicit args > JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars > cloud-TPU autodetection
    (jax.distributed.initialize with no args works on TPU pod slices) >
    single-process no-op. Safe to call more than once.
    """
    if jax.process_count() > 1:
        return True  # already initialized
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    num_processes = num_processes if num_processes is not None else (
        int(env_np) if env_np else None)
    env_pid = os.environ.get("JAX_PROCESS_ID")
    process_id = process_id if process_id is not None else (
        int(env_pid) if env_pid else None)

    if coordinator_address is None and num_processes is None:
        # Single host unless the TPU runtime says otherwise; initialize()
        # without arguments autodetects pod slices but raises off-TPU (and
        # on single-chip tunneled backends that still export TPU env vars),
        # so treat autodetection failure as "single process".
        if os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get(
                "MEGASCALE_COORDINATOR_ADDRESS"):
            try:
                jax.distributed.initialize()
            except RuntimeError:
                return False
            return jax.process_count() > 1
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    return jax.process_count() > 1


def sync_hosts(name: str = "barrier") -> None:
    """Block until every process reaches this point (no-op single-host)."""
    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def save_checkpoint_multihost(path: str, model, opt_state, iteration: int,
                              extra: dict | None = None) -> None:
    """Checkpoint write coordinated across hosts.

    Training state in this framework is replicated across shards (tile/data
    axes carry activations, not parameters), so process 0 materializes and
    writes the npz (models/io.py schema — unchanged, single-host readable)
    and every process joins a barrier afterwards. For gaussian-sharded
    params, pass a model whose arrays are fully-addressable (all-gather
    with jax.experimental.multihost_utils.process_allgather first).
    """
    from ..models import io as mio

    sync_hosts("pre-checkpoint")
    if jax.process_index() == 0:
        host_model = jax.tree_util.tree_map(
            lambda a: np.asarray(a) if hasattr(a, "shape") else a, model)
        mio.save_checkpoint(path, host_model, opt_state, iteration,
                            extra=extra)
    sync_hosts("post-checkpoint")
