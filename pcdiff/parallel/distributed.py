"""Multi-host initialization and cross-host reductions.

TPU-native analogue of the reference's process-group lifecycle
(``/root/reference/train.py:84-90,341``): ``jax.distributed.initialize()``
from environment/args, per-host identity helpers, and host-level scalar
reductions for logging (the ``dist.all_reduce`` at ``train.py:243-247``).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

__all__ = ["initialize", "is_lead_host", "host_mean"]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX. On TPU pods the arguments are discovered
    from the environment; a single-process run is a no-op."""
    if num_processes == 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        # already initialized, or single-process without coordinator
        pass


def is_lead_host() -> bool:
    return jax.process_index() == 0


def host_mean(value: float) -> float:
    """Mean of a host-local scalar across processes (logging only).

    Under SPMD jit the training loss is already globally reduced; this is
    for host-side quantities (e.g. data-pipeline timings).
    """
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils

    arr = multihost_utils.process_allgather(np.asarray(value, dtype=np.float64))
    return float(np.mean(arr))
