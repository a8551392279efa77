"""Characterized-motion export: re-rooting + BVH writing.

Semantics target: test_fullframework.py:672-718 — drop the synthesized root
bone, move the hips to world space via FK, and save Euler-degree BVH with
zyx channel order.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax.numpy as jnp

from ..kinematics import quat
from ..io import bvh


def reroot_to_hips(Ypos: np.ndarray, Yrot: np.ndarray, parents) -> tuple:
    """(T, J, .) root-augmented pose -> (T, J-1, .) with world-space hips."""
    # f64-root streams can emit mixed f64/f32 pose arrays; FK's scatter
    # updates require value dtype == operand dtype (a mismatch is a JAX
    # FutureWarning today, an error in future releases) — promote both
    # to the wider of the two before the device call
    dtype = np.result_type(np.asarray(Ypos).dtype, np.asarray(Yrot).dtype)
    grot, gpos = quat.fk(jnp.asarray(np.asarray(Yrot, dtype)),
                         jnp.asarray(np.asarray(Ypos, dtype)), parents)
    out_pos = np.asarray(Ypos)[:, 1:].copy()
    out_rot = np.asarray(Yrot)[:, 1:].copy()
    out_pos[:, 0] = np.asarray(gpos)[:, 1]
    out_rot[:, 0] = np.asarray(grot)[:, 1]
    return out_pos, out_rot


def save_characterized_bvh(path: str, Ypos: np.ndarray, Yrot: np.ndarray,
                           parents_with_root, names: Sequence[str],
                           order: str = "zyx",
                           frametime: float = 1.0 / 60.0) -> None:
    """Write a characterized stream to BVH (original 24-joint rig)."""
    pos, rot = reroot_to_hips(Ypos, Yrot, parents_with_root)
    parents_original = np.asarray(parents_with_root)[1:] - 1
    parents_original[0] = -1
    bvh.save(path, {
        "rotations": np.degrees(np.asarray(quat.to_euler(jnp.asarray(rot)))),
        "positions": pos,
        "offsets": pos[0],
        "parents": parents_original,
        "names": list(names),
        "order": order,
    }, frametime=frametime)
