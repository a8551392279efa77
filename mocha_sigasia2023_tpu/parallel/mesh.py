"""Device mesh + sharding helpers.

The reference's entire distributed story is single-process
``nn.DataParallel`` (trainer.py:45-47).  The TPU-native equivalent is SPMD:
a ``(data, model)`` mesh, batches sharded on ``data``, params replicated,
and XLA inserting the gradient all-reduce over ICI.  ``model`` is kept at 1
(the 5-10M-param MOCHA nets need no tensor parallelism — SURVEY.md §2.7)
but the axis is plumbed so larger variants shard without code changes.
Multi-host extends the same mesh over DCN via ``jax.distributed``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = jax.devices() if devices is None else devices
    if n_data is None:
        n_data = len(devices) // n_model
    use = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(use, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Place a host batch with the leading axis split across ``data``."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params, optimizer state) across the mesh."""
    sh = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


def shard_streams(mesh: Mesh, frame0, xs, keys):
    """Place batched-characterization inputs (runtime.stream
    stack_stream_inputs layout) with the STREAM axis split across ``data``
    — the serving-side scale-out: S parallel characterization streams run
    data-parallel over the mesh, each device scanning its shard's frames
    with no cross-device communication (streams are independent).

    frame0 leaves are (S, ...) -> shard dim 0; xs leaves are (T-1, S, ...)
    -> shard dim 1; keys (S, 2) -> shard dim 0.
    """
    f0_sh = NamedSharding(mesh, P("data"))
    xs_sh = NamedSharding(mesh, P(None, "data"))
    frame0 = jax.tree.map(lambda a: jax.device_put(a, f0_sh), frame0)
    xs = jax.tree.map(lambda a: jax.device_put(a, xs_sh), xs)
    keys = jax.device_put(keys, f0_sh)
    return frame0, xs, keys


def data_parallel_jit(fn, mesh: Mesh, *, donate_argnums=()):
    """jit ``fn(state, batch, ...)`` under the mesh: state replicated,
    batch sharded on ``data``; XLA emits psum-over-ICI for the gradients.

    The returned callable expects already-placed inputs (use
    :func:`shard_batch` / :func:`replicate`); jit propagates shardings.
    """
    return jax.jit(fn, donate_argnums=donate_argnums)
