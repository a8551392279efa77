"""Checkpointing: msgpack pytree serialization + latest-checkpoint discovery.

Role parity: trainer.py:210-247 ({'gen','gen_ema','gen_opt'} every
save_every epochs, resume restores the optimizer and parses the epoch from
the filename).  Serialization uses flax.serialization msgpack — a single
portable file per checkpoint, no torch dependency.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, state: Dict[str, Any]) -> None:
    """Atomically write a pytree-of-arrays checkpoint.  NamedTuple states
    (optax) are converted to plain dicts via flax's state-dict protocol."""
    state = serialization.to_state_dict(jax.tree.map(np.asarray, state))
    payload = serialization.msgpack_serialize(state)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)


def load_checkpoint(path: str, template: Optional[Dict] = None) -> Dict:
    with open(path, "rb") as f:
        state = serialization.msgpack_restore(f.read())
    if template is not None:
        state = serialization.from_state_dict(template, state)
    return state


def checkpoint_path(model_dir: str, epoch: int, prefix: str = "gen") -> str:
    return os.path.join(model_dir, f"{prefix}_{epoch:03d}.msgpack")


def latest_checkpoint(model_dir: str, prefix: str = "gen") -> Optional[str]:
    """Lexicographically-last checkpoint (etc/utils.py:67-77 semantics)."""
    if not os.path.isdir(model_dir):
        return None
    files = [
        f for f in os.listdir(model_dir)
        if f.startswith(prefix) and f.endswith((".msgpack", ".ckpt"))
    ]
    if not files:
        return None
    return os.path.join(model_dir, sorted(files)[-1])


def epoch_from_path(path: str) -> int:
    """Parse the epoch from a checkpoint filename (trainer.py:244)."""
    m = re.search(r"_(\d+)\.(?:msgpack|ckpt|pt)$", path)
    return int(m.group(1)) if m else 0


def restore_like(template, state):
    """Rebuild original container types (lists of layers, NamedTuples) from
    a msgpack-restored state dict: flax's to_state_dict turns lists into
    {'0': ...} dicts, so applying loaded params requires a structural
    template (e.g. a freshly initialized model)."""
    return serialization.from_state_dict(template, state)


# ---------------------------------------------------------------------------
# Orbax backend (directory-based, async-capable; SURVEY.md §5 recommendation)
# ---------------------------------------------------------------------------


def save_checkpoint_orbax(path: str, state: Dict[str, Any]) -> None:
    """Write a checkpoint directory with orbax (interchangeable content with
    the msgpack format via the same state-dict structure)."""
    import orbax.checkpoint as ocp

    state = serialization.to_state_dict(jax.tree.map(np.asarray, state))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()


def load_checkpoint_orbax(path: str, template: Optional[Dict] = None) -> Dict:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(os.path.abspath(path))
    if template is not None:
        state = serialization.from_state_dict(template, state)
    return state
