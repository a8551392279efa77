"""Multi-host initialization (DCN) helpers.

Single-host multi-chip needs nothing (the mesh spans local devices over
ICI).  For pod slices spanning hosts, call :func:`initialize_multihost`
once per process before any jax usage; the same (data, model) mesh then
spans all hosts, with XLA routing intra-slice collectives over ICI and
cross-host traffic over DCN.  The reference has no distributed story at all
(SURVEY.md §2.7) — this is the forward-looking scale path.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Wire this process into a multi-host JAX cluster.

    Arguments default to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) or the
    TPU pod metadata when running on Cloud TPU VMs (all None).
    """
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


def is_primary_host() -> bool:
    return jax.process_index() == 0
