"""Inertialization springs + foot-contact state machine (JAX, branchless).

Functional parity target: /root/reference/motion/Inertialization.py.  The
reference implements the contact lock/unlock logic with Python `if`s over
per-bone scalars (Inertialization.py:300-377); here the whole machine is a
pure function over a batched state pytree (any leading axes — contact bones,
streams, ...) using `where`-selects, so it lives inside the jitted streaming
step and inside `lax.scan` over frames.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import quat


def fast_negexpf(x):
    """Cheap approximation of exp(-x) (Inertialization.py:10-11)."""
    return 1.0 / (1.0 + x + 0.48 * x * x + 0.235 * x * x * x)


def halflife_to_damping(halflife, eps=1e-5):
    return (4.0 * jnp.log(2.0)) / (halflife + eps)


def decay_spring_damper_pos(x, v, halflife, dt):
    """Critically-damped spring decay toward zero for vectors
    (Inertialization.py:18-26)."""
    y = halflife_to_damping(halflife) / 2.0
    j1 = v + x * y
    eydt = fast_negexpf(y * dt)
    return eydt * (x + j1 * dt), eydt * (v - j1 * y * dt)


def decay_spring_damper_rot(x, v, halflife, dt):
    """Spring decay toward identity for quaternion offsets
    (Inertialization.py:28-37)."""
    y = halflife_to_damping(halflife) / 2.0
    j0 = quat.to_scaled_angle_axis(x)
    j1 = v + j0 * y
    eydt = fast_negexpf(y * dt)
    return (
        quat.from_scaled_angle_axis(eydt * (j0 + j1 * dt)),
        eydt * (v - j1 * y * dt),
    )


def transition_pos(off_x, off_v, src_x, src_v, dst_x, dst_v):
    """(Inertialization.py:71-74)"""
    return (src_x + off_x) - dst_x, (src_v + off_v) - dst_v


def update_pos(off_x, off_v, in_x, in_v, halflife, dt):
    """(Inertialization.py:76-80) -> out_x, out_v, off_x, off_v"""
    off_x, off_v = decay_spring_damper_pos(off_x, off_v, halflife, dt)
    return in_x + off_x, in_v + off_v, off_x, off_v


def transition_rot(off_x, off_v, src_x, src_v, dst_x, dst_v):
    """(Inertialization.py:82-85)"""
    off_x = quat.abs_(quat.mul(quat.mul(off_x, src_x), quat.inv(dst_x)))
    return off_x, (off_v + src_v) - dst_v


def update_rot(off_x, off_v, in_x, in_v, halflife, dt):
    """(Inertialization.py:87-91) -> out_x, out_v, off_x, off_v"""
    off_x, off_v = decay_spring_damper_rot(off_x, off_v, halflife, dt)
    return quat.mul(off_x, in_x), off_v + in_v, off_x, off_v


class ContactState(NamedTuple):
    """Per-contact-bone carried state, batched over any leading axes.

    Mirrors the eight per-bone scalars the reference threads through
    `contact_update` (Inertialization.py:300-315).
    """

    state: jnp.ndarray           # (...,)   bool — contact active last frame
    lock: jnp.ndarray            # (...,)   bool — foot currently locked
    position: jnp.ndarray        # (..., 3) inertialized contact position
    velocity: jnp.ndarray        # (..., 3)
    point: jnp.ndarray           # (..., 3) locked ground point
    target: jnp.ndarray          # (..., 3) previous raw input position
    offset_position: jnp.ndarray  # (..., 3) inertializer offset
    offset_velocity: jnp.ndarray  # (..., 3)

    @staticmethod
    def init(toe_positions, toe_velocities=None):
        """Reset as test_fullframework.py:412-431: unlocked, pinned at the
        toe's current global position."""
        p = jnp.asarray(toe_positions)
        z = jnp.zeros_like(p)
        shape = p.shape[:-1]
        return ContactState(
            state=jnp.zeros(shape, dtype=bool),
            lock=jnp.zeros(shape, dtype=bool),
            position=p,
            velocity=z if toe_velocities is None else jnp.asarray(toe_velocities),
            point=p,
            target=p,
            offset_position=z,
            offset_velocity=z,
        )


def contact_update(cs: ContactState, input_position, input_state,
                   unlock_radius, foot_height, halflife, dt,
                   eps=1e-8) -> ContactState:
    """Branchless port of the lock/unlock state machine
    (Inertialization.py:300-377).  All inputs broadcast over the state's
    leading axes, so both feet (and any number of parallel streams) update
    in one fused call.
    """
    input_state = jnp.asarray(input_state).astype(bool)

    # Finite-difference input velocity against the previous raw target.
    input_velocity = (input_position - cs.target) / (dt + eps)
    new_target = input_position

    # Tick the inertializer: when locked track the lock point at zero
    # velocity, otherwise track the raw animation input.
    lock_b = cs.lock[..., None]
    in_x = jnp.where(lock_b, cs.point, input_position)
    in_v = jnp.where(lock_b, jnp.zeros_like(input_velocity), input_velocity)
    position, velocity, off_p, off_v = update_pos(
        cs.offset_position, cs.offset_velocity, in_x, in_v, halflife, dt
    )

    unlock = cs.lock & (
        quat.length(cs.point - input_position) > unlock_radius
    )

    # Branch 1: new contact begins -> lock at the current inertialized
    # position projected to foot height.
    just_locked = (~cs.state) & input_state
    lock_point = jnp.concatenate(
        [
            position[..., 0:1],
            jnp.full_like(position[..., 1:2], foot_height),
            position[..., 2:3],
        ],
        axis=-1,
    )
    t1_off_p, t1_off_v = transition_pos(
        off_p, off_v, input_position, input_velocity,
        lock_point, jnp.zeros_like(input_velocity),
    )

    # Branch 2: contact ends or the lock drifted too far -> unlock.
    just_unlocked = (~just_locked) & (
        (cs.lock & cs.state & (~input_state)) | unlock
    )
    t2_off_p, t2_off_v = transition_pos(
        off_p, off_v, cs.point, jnp.zeros_like(input_velocity),
        input_position, input_velocity,
    )

    jl = just_locked[..., None]
    ju = just_unlocked[..., None]
    new_off_p = jnp.where(jl, t1_off_p, jnp.where(ju, t2_off_p, off_p))
    new_off_v = jnp.where(jl, t1_off_v, jnp.where(ju, t2_off_v, off_v))
    new_point = jnp.where(jl, lock_point, cs.point)
    new_lock = jnp.where(just_locked, True, jnp.where(just_unlocked, False, cs.lock))

    return ContactState(
        state=input_state,
        lock=new_lock,
        position=position,
        velocity=velocity,
        point=new_point,
        target=new_target,
        offset_position=new_off_p,
        offset_velocity=new_off_v,
    )


class PoseOffsets(NamedTuple):
    """Whole-pose inertializer offsets (Inertialization.py:136-209)."""

    pos: jnp.ndarray   # (..., J, 3)
    vel: jnp.ndarray   # (..., J, 3)
    rot: jnp.ndarray   # (..., J, 4)
    ang: jnp.ndarray   # (..., J, 3)

    @staticmethod
    def zeros(shape_j, dtype=jnp.float32):
        j = shape_j if isinstance(shape_j, tuple) else (shape_j,)
        return PoseOffsets(
            pos=jnp.zeros(j + (3,), dtype),
            vel=jnp.zeros(j + (3,), dtype),
            rot=jnp.broadcast_to(
                jnp.asarray([1.0, 0, 0, 0], dtype), j + (4,)
            ),
            ang=jnp.zeros(j + (3,), dtype),
        )


def pose_transition(off: PoseOffsets, root_position, root_velocity,
                    root_rotation, root_angular_velocity,
                    src_pos, src_vel, src_rot, src_ang,
                    dst_pos, dst_vel, dst_rot, dst_ang):
    """Vectorized whole-pose transition (Inertialization.py:136-209).
    Bone 0 is the root and uses world-space destination velocities."""
    t_dst_pos, t_dst_rot = root_position, root_rotation
    t_src_pos = dst_pos[..., 0, :]
    t_src_rot = dst_rot[..., 0, :]

    ws_dst_vel = quat.mul_vec(t_dst_rot, quat.mul_vec(t_src_rot, dst_vel[..., 0, :]))
    ws_dst_ang = quat.mul_vec(t_dst_rot, quat.mul_vec(t_src_rot, dst_ang[..., 0, :]))

    # Root rows.
    r_off_p, r_off_v = transition_pos(
        off.pos[..., 0, :], off.vel[..., 0, :],
        root_position, root_velocity, root_position, ws_dst_vel,
    )
    r_off_r, r_off_a = transition_rot(
        off.rot[..., 0, :], off.ang[..., 0, :],
        root_rotation, root_angular_velocity, root_rotation, ws_dst_ang,
    )
    # Remaining bones, batched.
    b_off_p, b_off_v = transition_pos(
        off.pos[..., 1:, :], off.vel[..., 1:, :],
        src_pos[..., 1:, :], src_vel[..., 1:, :],
        dst_pos[..., 1:, :], dst_vel[..., 1:, :],
    )
    b_off_r, b_off_a = transition_rot(
        off.rot[..., 1:, :], off.ang[..., 1:, :],
        src_rot[..., 1:, :], src_ang[..., 1:, :],
        dst_rot[..., 1:, :], dst_ang[..., 1:, :],
    )
    new = PoseOffsets(
        pos=jnp.concatenate([r_off_p[..., None, :], b_off_p], axis=-2),
        vel=jnp.concatenate([r_off_v[..., None, :], b_off_v], axis=-2),
        rot=jnp.concatenate([r_off_r[..., None, :], b_off_r], axis=-2),
        ang=jnp.concatenate([r_off_a[..., None, :], b_off_a], axis=-2),
    )
    return new, (t_src_pos, t_src_rot, t_dst_pos, t_dst_rot)


def pose_update(off: PoseOffsets, in_pos, in_vel, in_rot, in_ang,
                transition, halflife, dt):
    """Vectorized whole-pose inertializer tick (Inertialization.py:217-297).
    Returns (pos, vel, rot, ang, new_offsets)."""
    t_src_pos, t_src_rot, t_dst_pos, t_dst_rot = transition

    ws_pos = quat.mul_vec(
        t_dst_rot, quat.inv_mul_vec(t_src_rot, in_pos[..., 0, :] - t_src_pos)
    ) + t_dst_pos
    ws_vel = quat.mul_vec(t_dst_rot, quat.inv_mul_vec(t_src_rot, in_vel[..., 0, :]))
    ws_rot = quat.normalize(
        quat.mul(t_dst_rot, quat.inv_mul(t_src_rot, in_rot[..., 0, :]))
    )
    ws_ang = quat.mul_vec(t_dst_rot, quat.inv_mul_vec(t_src_rot, in_ang[..., 0, :]))

    root_in_pos = ws_pos
    root_in_vel = ws_vel
    root_in_rot = ws_rot
    root_in_ang = ws_ang

    full_in_pos = jnp.concatenate([root_in_pos[..., None, :], in_pos[..., 1:, :]], axis=-2)
    full_in_vel = jnp.concatenate([root_in_vel[..., None, :], in_vel[..., 1:, :]], axis=-2)
    full_in_rot = jnp.concatenate([root_in_rot[..., None, :], in_rot[..., 1:, :]], axis=-2)
    full_in_ang = jnp.concatenate([root_in_ang[..., None, :], in_ang[..., 1:, :]], axis=-2)

    pos, vel, off_p, off_v = update_pos(
        off.pos, off.vel, full_in_pos, full_in_vel, halflife, dt
    )
    rot, ang, off_r, off_a = update_rot(
        off.rot, off.ang, full_in_rot, full_in_ang, halflife, dt
    )
    return pos, vel, rot, ang, PoseOffsets(off_p, off_v, off_r, off_a)
