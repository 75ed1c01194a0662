"""Multi-host runtime helpers.

Counterpart of the reference's ``utils/distributed.py`` NCCL world helpers
(get_rank/get_world_size/reduce-loss-dict, :6-47) and its
``dist.init_process_group`` bootstrap (train_sm.py:630-638) — expressed
TPU-natively: ``jax.distributed.initialize`` for the multi-host runtime,
process-index/count for rank/world, and ``jax.make_array_from_process_local_data``
for per-host data feeding. Cross-host reductions inside compiled code are
GSPMD collectives (no explicit calls); the host-side loss-dict reduction uses
``multihost_utils.process_allgather``.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Multi-host bootstrap (``dist.init_process_group`` counterpart).

    On TPU pods all arguments are discovered from the environment; pass them
    explicitly for CPU/GPU multi-process testing.
    """
    if jax.process_count() > 1:
        return  # already initialized by the runtime
    if coordinator_address is not None or num_processes not in (None, 1):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def get_rank() -> int:
    """ref utils/distributed.py:6-13 (torch.distributed.get_rank)."""
    return jax.process_index()


def get_world_size() -> int:
    """ref utils/distributed.py:16-22."""
    return jax.process_count()


def is_main_process() -> bool:
    return get_rank() == 0


def reduce_loss_dict(loss_dict: Dict[str, float]) -> Dict[str, float]:
    """Average scalar metrics across hosts (ref reduce_loss_dict,
    utils/distributed.py:25-47 — which reduces to rank 0; here every host
    gets the mean, which subsumes that)."""
    if get_world_size() == 1:
        return dict(loss_dict)
    from jax.experimental import multihost_utils

    keys = sorted(loss_dict.keys())
    local = np.asarray([float(loss_dict[k]) for k in keys], np.float32)
    gathered = multihost_utils.process_allgather(local)
    mean = np.asarray(gathered).reshape(get_world_size(), -1).mean(axis=0)
    return {k: float(v) for k, v in zip(keys, mean)}


def barrier(name: str = "barrier"):
    """ref dist.barrier (train_sm.py:469)."""
    if get_world_size() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def local_batch(global_array: np.ndarray, mesh, pspec):
    """Build a globally-sharded array from per-host data
    (DistributedSampler counterpart, utils/distributed.py:50-57)."""
    return jax.make_array_from_process_local_data(
        jax.sharding.NamedSharding(mesh, pspec), global_array
    )
