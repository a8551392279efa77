"""BVH clip -> motion features, as fused JAX programs.

Semantics target: /root/reference/preprocess/generate_database.py:86-188 and
generate_database_bin.py:96-207.  The stages:

  1. Euler degrees -> unrolled quaternions; cm -> m.
  2. Optional mirroring (FK -> reflect x -> conjugate rotations -> IK).
  3. Root-bone synthesis: ground-projected Spine2 position (Savitzky-Golay
     window 15 order 3) + heading from the shoulder/hip "across" vector
     (savgol window 31), prepended as bone 0 (24 joints -> 25 bones).
  4. Central-difference linear/angular velocities with endpoint
     extrapolation.
  5. FK-with-velocities -> toe-speed foot contacts, majority-vote median
     filter (size 6, mode nearest).

TPU-native choices: Savitzky-Golay runs as a fixed FIR convolution with
precomputed least-squares edge matrices (scipy is used only at setup to
build static coefficients); the median filter is a windowed majority count;
everything composes into one jit per clip length.
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..kinematics import quat


# ---------------------------------------------------------------------------
# Savitzky-Golay as FIR + static edge projection (scipy parity, mode='interp')
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _savgol_matrices(window: int, polyorder: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Static (center_coeffs, left_edge, right_edge) matrices.

    Built from the least-squares polynomial-fit definition: fitting a degree-
    ``polyorder`` polynomial to ``window`` samples and evaluating at position
    p is the linear map row ``e_p @ pinv(V)`` with Vandermonde V[j,k] = j^k.
    ``mode='interp'`` evaluates the edge fits at the first/last half-window
    positions, exactly like scipy.signal.savgol_filter.
    """
    half = window // 2
    j = np.arange(window, dtype=np.float64)
    V = np.vander(j, polyorder + 1, increasing=True)  # (window, order+1)
    P = np.linalg.pinv(V)  # (order+1, window)

    def eval_rows(positions):
        E = np.vander(np.asarray(positions, np.float64), polyorder + 1,
                      increasing=True)
        return E @ P  # (len(positions), window)

    center = eval_rows([half])[0]          # (window,) interior FIR taps
    left = eval_rows(np.arange(half))      # (half, window) @ x[:window]
    right = eval_rows(np.arange(half + 1, window))  # (half, window) @ x[-window:]
    return center, left, right


def savgol_filter(x: jnp.ndarray, window: int, polyorder: int) -> jnp.ndarray:
    """Savitzky-Golay along axis 0, scipy ``mode='interp'`` semantics.

    x: (T, ...) with T >= window.  Interior = depthwise FIR convolution
    (one fused XLA conv); edges = two small static matmuls.
    """
    center, left, right = _savgol_matrices(window, polyorder)
    dtype = x.dtype
    T = x.shape[0]
    half = window // 2

    flat = x.reshape(T, -1)
    C = flat.shape[1]

    # interior: conv over time, channels as batch
    lhs = flat.T[:, None, :]  # (C, 1, T)
    rhs = jnp.asarray(center[::-1].copy(), dtype)[None, None, :]  # correlation
    interior = lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID"
    )[:, 0, :].T  # (T - window + 1, C)

    lm = jnp.asarray(left, dtype)
    rm = jnp.asarray(right, dtype)
    head = lm @ flat[:window]
    tail = rm @ flat[-window:]
    out = jnp.concatenate([head, interior, tail], axis=0)
    return out.reshape(x.shape)


# ---------------------------------------------------------------------------
# Median "majority vote" filter for contacts
# ---------------------------------------------------------------------------


def median_vote(contacts: jnp.ndarray, size: int = 6) -> jnp.ndarray:
    """Boolean median filter along axis 0, matching
    scipy.ndimage.median_filter(size=size, mode='nearest') on 0/1 input
    (generate_database.py:173-177).

    For booleans the rank-(size//2) median equals "at least size - size//2
    of the window are True"; the window for even sizes spans offsets
    [-size//2, size//2 - 1] with edge replication.
    """
    k = size
    lead, trail = k // 2, k - 1 - k // 2
    x = contacts.astype(jnp.int32)
    pad_head = jnp.repeat(x[:1], lead, axis=0)
    pad_tail = jnp.repeat(x[-1:], trail, axis=0)
    xp = jnp.concatenate([pad_head, x, pad_tail], axis=0)
    c = jnp.cumsum(xp, axis=0)
    c = jnp.concatenate([jnp.zeros_like(c[:1]), c], axis=0)
    counts = c[k:] - c[:-k]
    return counts >= (k - k // 2)


# ---------------------------------------------------------------------------
# Mirroring
# ---------------------------------------------------------------------------


def mirror_map(names: Sequence[str]) -> np.ndarray:
    """Left<->Right joint permutation from names (generate_database.py:42-45)."""
    idx = []
    for n in names:
        if n.startswith("Right"):
            idx.append(names.index("Left" + n[5:]))
        elif n.startswith("Left"):
            idx.append(names.index("Right" + n[4:]))
        else:
            idx.append(names.index(n))
    return np.asarray(idx, dtype=np.int32)


def animation_mirror(lrot, lpos, names, parents):
    """Mirror a clip across the x plane (generate_database.py:40-55):
    FK -> reflect world positions, conjugate world rotation matrices with a
    sign mask, swap Left/Right joints -> IK back to locals."""
    jm = mirror_map(tuple(names))
    dtype = lrot.dtype
    mirror_pos = jnp.asarray([-1.0, 1.0, 1.0], dtype)
    mirror_rot = jnp.asarray(
        [[-1.0, -1.0, 1.0], [1.0, 1.0, -1.0], [1.0, 1.0, -1.0]], dtype
    )
    grot, gpos = quat.fk(lrot, lpos, parents)
    gpos_m = mirror_pos * gpos[..., jm, :]
    grot_m = quat.from_xform(mirror_rot * quat.to_xform(grot[..., jm, :]))
    return quat.ik(grot_m, gpos_m, parents)


# ---------------------------------------------------------------------------
# Velocities
# ---------------------------------------------------------------------------


def central_velocity(positions: jnp.ndarray, fps: float = 60.0) -> jnp.ndarray:
    """Central-difference linear velocity with the reference's endpoint
    extrapolation (generate_database.py:138-143)."""
    inner = 0.5 * (positions[2:] - positions[1:-1]) * fps + \
            0.5 * (positions[1:-1] - positions[:-2]) * fps
    first = inner[0] - (inner[2] - inner[1])
    last = inner[-1] + (inner[-1] - inner[-2])
    return jnp.concatenate([first[None], inner, last[None]], axis=0)


def central_angular_velocity(rotations: jnp.ndarray, fps: float = 60.0) -> jnp.ndarray:
    """Central-difference angular velocity (generate_database.py:146-151)."""
    fwd = quat.to_scaled_angle_axis(
        quat.abs_(quat.mul_inv(rotations[2:], rotations[1:-1]))
    )
    bwd = quat.to_scaled_angle_axis(
        quat.abs_(quat.mul_inv(rotations[1:-1], rotations[:-2]))
    )
    inner = 0.5 * fwd * fps + 0.5 * bwd * fps
    first = inner[0] - (inner[2] - inner[1])
    last = inner[-1] + (inner[-1] - inner[-2])
    return jnp.concatenate([first[None], inner, last[None]], axis=0)


# ---------------------------------------------------------------------------
# Full clip featurization
# ---------------------------------------------------------------------------

ROOT_POSITION_JOINT = "Spine2"
ACROSS_JOINTS = ("LeftShoulder", "RightShoulder", "LeftUpLeg", "RightUpLeg")
CONTACT_JOINTS = ("LeftToeBase", "RightToeBase")


def featurize_clip(
    rotations_deg: jnp.ndarray,
    positions_cm: jnp.ndarray,
    order: str,
    names: Sequence[str],
    parents: Sequence[int],
    *,
    mirror: bool = False,
    contact_velocity_threshold: float = 0.5,
    fps: float = 60.0,
) -> Dict[str, jnp.ndarray]:
    """BVH arrays -> per-frame motion features with a synthesized root bone.

    Returns dict(positions, velocities, rotations, angular_velocities,
    contacts) over the (J+1)-bone rig plus static ``bone_parents`` /
    ``bone_names``.  Mirrors generate_database.py:86-177 stage for stage;
    the entire function jit-compiles to a single XLA program per clip
    length (use via :func:`featurize_clip_jit`).
    """
    names = list(names)
    parents = np.asarray(parents)

    rotations = quat.unroll(quat.from_euler(jnp.radians(rotations_deg), order=order))
    positions = positions_cm * 0.01

    if mirror:
        rotations, positions = animation_mirror(rotations, positions, names, parents)
        rotations = quat.unroll(rotations)

    grot, gpos = quat.fk(rotations, positions, parents)

    # Root position: ground-projected, smoothed spine joint.
    spine = names.index(ROOT_POSITION_JOINT)
    dtype = positions.dtype
    root_position = jnp.asarray([1.0, 0.0, 1.0], dtype) * gpos[:, spine : spine + 1]
    root_position = savgol_filter(root_position, 15, 3)

    # Root heading: smoothed cross of the shoulder+hip across vector with up.
    sdr_l, sdr_r, hip_l, hip_r = (names.index(n) for n in ACROSS_JOINTS)
    across = (
        gpos[:, sdr_l : sdr_l + 1] - gpos[:, sdr_r : sdr_r + 1]
    ) + (gpos[:, hip_l : hip_l + 1] - gpos[:, hip_r : hip_r + 1])
    root_dir = jnp.asarray([1.0, 0.0, 1.0], dtype) * jnp.cross(
        across, jnp.asarray([0.0, 1.0, 0.0], dtype)
    )
    root_dir = root_dir / jnp.sqrt(jnp.sum(jnp.square(root_dir), axis=-1))[..., None]
    root_dir = savgol_filter(root_dir, 31, 3)
    root_dir = root_dir / jnp.sqrt(jnp.sum(jnp.square(root_dir), axis=-1))[..., None]
    root_rotation = quat.normalize(
        quat.between(jnp.asarray([0.0, 0.0, 1.0], dtype), root_dir)
    )

    # Re-parent the old root under the new synthesized root bone.
    hips_pos = quat.mul_vec(quat.inv(root_rotation), positions[:, 0:1] - root_position)
    hips_rot = quat.mul(quat.inv(root_rotation), rotations[:, 0:1])
    positions = jnp.concatenate([root_position, hips_pos, positions[:, 1:]], axis=1)
    rotations = jnp.concatenate([root_rotation, hips_rot, rotations[:, 1:]], axis=1)

    bone_parents = np.concatenate([[-1], parents + 1])
    bone_names = ["Root"] + names

    velocities = central_velocity(positions, fps)
    angular_velocities = central_angular_velocity(rotations, fps)

    _, _, gvel, _ = quat.fk_vel(
        rotations, positions, velocities, angular_velocities, bone_parents
    )

    toes = np.asarray([bone_names.index(n) for n in CONTACT_JOINTS])
    contact_speed = jnp.sqrt(jnp.sum(gvel[:, toes] ** 2, axis=-1))
    contacts = median_vote(contact_speed < contact_velocity_threshold, size=6)

    return {
        "positions": positions,
        "velocities": velocities,
        "rotations": rotations,
        "angular_velocities": angular_velocities,
        "contacts": contacts,
        "bone_parents": bone_parents,
        "bone_names": bone_names,
    }


_ARRAY_KEYS = (
    "positions", "velocities", "rotations", "angular_velocities", "contacts"
)


@functools.lru_cache(maxsize=64)
def _featurize_jitted(nframes, order, names, parents, mirror, threshold, fps):
    parents_arr = np.asarray(parents)

    def fn(rot_deg, pos_cm):
        out = featurize_clip(
            rot_deg, pos_cm, order, list(names), parents_arr,
            mirror=mirror, contact_velocity_threshold=threshold, fps=fps,
        )
        return {k: out[k] for k in _ARRAY_KEYS}

    return jax.jit(fn)


def featurize_clip_jit(bvh_data: Dict, *, mirror=False,
                       contact_velocity_threshold=0.5, fps=60.0,
                       dtype=jnp.float32) -> Dict:
    """Jit-cached featurization keyed on (clip length, skeleton, flags)."""
    rot = jnp.asarray(bvh_data["rotations"], dtype)
    pos = jnp.asarray(bvh_data["positions"], dtype)
    fn = _featurize_jitted(
        rot.shape[0],
        bvh_data["order"],
        tuple(bvh_data["names"]),
        tuple(int(p) for p in bvh_data["parents"]),
        bool(mirror),
        float(contact_velocity_threshold),
        float(fps),
    )
    out = dict(fn(rot, pos))
    out["bone_parents"] = np.concatenate([[-1], np.asarray(bvh_data["parents"]) + 1])
    out["bone_names"] = ["Root"] + list(bvh_data["names"])
    return out
