"""Quaternion algebra + forward/inverse kinematics in JAX.

Functional parity targets (formulas, not code): /root/reference/motion/quat.py
and motion/tquat.py.  Everything here is pure jnp: differentiable, vmappable,
and shaped so XLA can fuse the whole pipeline.  The reference's per-joint
Python FK loop (quat.py:166-204) is replaced by *ancestor-chain* FK: every
joint accumulates the transform product along its static root->joint chain
in parallel, so the sequential length equals the skeleton depth (~9 for the
25-bone mocha rig), all steps are batched over joints, and the program
contains only static gathers (no scatter updates — important for the TPU
compiler, see xform.py NOTE).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from ..ops.numerics import safe_sqrt, safe_unit_denom


def _cross(a, b):
    return jnp.concatenate(
        [
            a[..., 1:2] * b[..., 2:3] - a[..., 2:3] * b[..., 1:2],
            a[..., 2:3] * b[..., 0:1] - a[..., 0:1] * b[..., 2:3],
            a[..., 0:1] * b[..., 1:2] - a[..., 1:2] * b[..., 0:1],
        ],
        axis=-1,
    )


def eye(shape=(), dtype=jnp.float32):
    """Identity quaternion broadcast to ``shape + (4,)``."""
    return jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype=dtype), tuple(shape) + (4,)
    )


def length(x):
    return jnp.sqrt(jnp.sum(x * x, axis=-1))


def normalize(x, eps=1e-8):
    # safe_sqrt keeps the gradient finite at x == 0 (d||x||/dx = 0/0
    # otherwise); values/grads are bitwise-unchanged for ||x|| >= 1e-15
    return x / (safe_sqrt(jnp.sum(x * x, axis=-1), 1e-30)[..., None] + eps)


def abs_(x):
    """Hemisphere fix: negate quaternions with negative w (quat.py:18)."""
    return jnp.where(x[..., 0:1] > 0.0, x, -x)


def from_angle_axis(angle, axis):
    c = jnp.cos(angle / 2.0)[..., None]
    s = jnp.sin(angle / 2.0)[..., None]
    return jnp.concatenate([c, s * axis], axis=-1)


def to_xform(q):
    """Quaternion -> 3x3 rotation matrix (rows on axis -2)."""
    qw, qx, qy, qz = q[..., 0:1], q[..., 1:2], q[..., 2:3], q[..., 3:4]
    x2, y2, z2 = qx + qx, qy + qy, qz + qz
    xx, yy, wx = qx * x2, qy * y2, qw * x2
    xy, yz, wy = qx * y2, qy * z2, qw * y2
    xz, zz, wz = qx * z2, qz * z2, qw * z2
    r0 = jnp.concatenate([1.0 - (yy + zz), xy - wz, xz + wy], axis=-1)
    r1 = jnp.concatenate([xy + wz, 1.0 - (xx + zz), yz - wx], axis=-1)
    r2 = jnp.concatenate([xz - wy, yz + wx, 1.0 - (xx + yy)], axis=-1)
    return jnp.stack([r0, r1, r2], axis=-2)


def to_xform_xy(q):
    """Quaternion -> first two columns of the rotation matrix (the 6D
    rotation representation used as the network's `txy` feature,
    quat.py:42-55).  Output shape (..., 3, 2)."""
    qw, qx, qy, qz = q[..., 0:1], q[..., 1:2], q[..., 2:3], q[..., 3:4]
    x2, y2, z2 = qx + qx, qy + qy, qz + qz
    xx, yy, wx = qx * x2, qy * y2, qw * x2
    xy, yz, wy = qx * y2, qy * z2, qw * y2
    xz, zz, wz = qx * z2, qz * z2, qw * z2
    r0 = jnp.concatenate([1.0 - (yy + zz), xy - wz], axis=-1)
    r1 = jnp.concatenate([xy + wz, 1.0 - (xx + zz)], axis=-1)
    r2 = jnp.concatenate([xz - wy, yz + wx], axis=-1)
    return jnp.stack([r0, r1, r2], axis=-2)


def from_euler(e, order="zyx"):
    """Intrinsic Euler angles (radians) -> quaternion (quat.py:57-67)."""
    dtype = jnp.result_type(e)
    axes = {
        "x": jnp.asarray([1.0, 0.0, 0.0], dtype=dtype),
        "y": jnp.asarray([0.0, 1.0, 0.0], dtype=dtype),
        "z": jnp.asarray([0.0, 0.0, 1.0], dtype=dtype),
    }
    q0 = from_angle_axis(e[..., 0], axes[order[0]])
    q1 = from_angle_axis(e[..., 1], axes[order[1]])
    q2 = from_angle_axis(e[..., 2], axes[order[2]])
    return mul(q0, mul(q1, q2))


def from_xform(m):
    """3x3 rotation matrix -> quaternion via the branch-per-largest-diagonal
    construction (quat.py:69-94).  Branchless: all four candidates are
    computed and selected with `where` (each candidate is NaN-free for any
    real input, so unselected branches cannot poison gradients)."""
    m00, m11, m22 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]

    cand_x = jnp.stack(
        [m[..., 2, 1] - m[..., 1, 2], 1.0 + m00 - m11 - m22,
         m[..., 1, 0] + m[..., 0, 1], m[..., 0, 2] + m[..., 2, 0]], axis=-1)
    cand_y = jnp.stack(
        [m[..., 0, 2] - m[..., 2, 0], m[..., 1, 0] + m[..., 0, 1],
         1.0 - m00 + m11 - m22, m[..., 2, 1] + m[..., 1, 2]], axis=-1)
    cand_z = jnp.stack(
        [m[..., 1, 0] - m[..., 0, 1], m[..., 0, 2] + m[..., 2, 0],
         m[..., 2, 1] + m[..., 1, 2], 1.0 - m00 - m11 + m22], axis=-1)
    cand_w = jnp.stack(
        [1.0 + m00 + m11 + m22, m[..., 2, 1] - m[..., 1, 2],
         m[..., 0, 2] - m[..., 2, 0], m[..., 1, 0] - m[..., 0, 1]], axis=-1)

    neg_trace = (m22 < 0.0)[..., None]
    q = jnp.where(
        neg_trace,
        jnp.where((m00 > m11)[..., None], cand_x, cand_y),
        jnp.where((m00 < -m11)[..., None], cand_z, cand_w),
    )
    return normalize(q)


def from_xform_xy(xy):
    """6D two-column representation -> quaternion (quat.py:96-107).
    Gram-Schmidt re-orthogonalization of the two columns, then matrix->quat.
    Input shape (..., 3, 2)."""
    c0 = xy[..., 0]
    c2 = _cross(c0, xy[..., 1])
    # safe_unit_denom: NETWORK-PREDICTED columns can go parallel/tiny —
    # the plain ||cross|| division is 0/0 = NaN forward and explodes in
    # the backward near the edge (ops/numerics.py); real columns are
    # bitwise-unaffected
    c2 = c2 / safe_unit_denom(c2)
    c1 = _cross(c2, c0)
    c1 = c1 / safe_unit_denom(c1)
    return from_xform(jnp.stack([c0, c1, c2], axis=-1))


def inv(q):
    return jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype) * q


def mul(x, y):
    """Hamilton product x ⊗ y (quat.py:112-120)."""
    x0, x1, x2, x3 = x[..., 0:1], x[..., 1:2], x[..., 2:3], x[..., 3:4]
    y0, y1, y2, y3 = y[..., 0:1], y[..., 1:2], y[..., 2:3], y[..., 3:4]
    return jnp.concatenate(
        [
            y0 * x0 - y1 * x1 - y2 * x2 - y3 * x3,
            y0 * x1 + y1 * x0 - y2 * x3 + y3 * x2,
            y0 * x2 + y1 * x3 + y2 * x0 - y3 * x1,
            y0 * x3 - y1 * x2 + y2 * x1 + y3 * x0,
        ],
        axis=-1,
    )


def inv_mul(x, y):
    return mul(inv(x), y)


def mul_inv(x, y):
    return mul(x, inv(y))


def mul_vec(q, v):
    """Rotate vector v by quaternion q (quat.py:128-130)."""
    t = 2.0 * _cross(q[..., 1:], v)
    return v + q[..., 0][..., None] * t + _cross(q[..., 1:], t)


def inv_mul_vec(q, v):
    return mul_vec(inv(q), v)


def unroll(x, axis=0):
    """Temporal hemisphere unrolling (quat.py:135-141).

    The reference flips q_t in a sequential loop whenever dot(q_t, q_{t-1})
    (with q_{t-1} already flipped) is negative.  The accumulated flip sign is
    a running product of per-step signs, so the whole operation is a
    `cumprod` — one parallel scan instead of a Python loop.
    """
    x = jnp.moveaxis(x, axis, 0)
    d = jnp.sum(x[1:] * x[:-1], axis=-1)
    step = jnp.where(d < 0.0, -1.0, 1.0).astype(x.dtype)
    sign = jnp.concatenate(
        [jnp.ones_like(step[:1]), jnp.cumprod(step, axis=0)], axis=0
    )
    return jnp.moveaxis(sign[..., None] * x, 0, axis)


def between(u, v):
    """Quaternion rotating direction u onto v (quat.py:143-147)."""
    w = (
        jnp.sqrt(jnp.sum(u * u, axis=-1) * jnp.sum(v * v, axis=-1))
        + jnp.sum(u * v, axis=-1)
    )[..., None]
    return jnp.concatenate([w, _cross(u, v)], axis=-1)


def log(q, eps=1e-5):
    # safe_sqrt: at the identity rotation the vector part is exactly 0 and
    # the plain sqrt backward is inf -> NaN through the eps-guarded where
    # (values unchanged: sqrt(1e-30) = 1e-15 < eps keeps branch selection)
    v_len = safe_sqrt(jnp.sum(jnp.square(q[..., 1:]), axis=-1),
                      1e-30)[..., None]
    safe = jnp.where(v_len < eps, jnp.ones_like(v_len), v_len)
    halfangle = jnp.where(
        v_len < eps, jnp.ones_like(v_len), jnp.arctan2(v_len, q[..., 0:1]) / safe
    )
    return halfangle * q[..., 1:]


def exp(v, eps=1e-5):
    # safe_sqrt: same identity-rotation gradient edge as log()
    halfangle = safe_sqrt(jnp.sum(jnp.square(v), axis=-1),
                          1e-30)[..., None]
    c = jnp.where(halfangle < eps, jnp.ones_like(halfangle), jnp.cos(halfangle))
    s = jnp.where(
        halfangle < eps, jnp.ones_like(halfangle), jnp.sinc(halfangle / jnp.pi)
    )
    return jnp.concatenate([c, s * v], axis=-1)


def to_scaled_angle_axis(q, eps=1e-5):
    return 2.0 * log(q, eps)


def from_scaled_angle_axis(v, eps=1e-5):
    return exp(v / 2.0, eps)


def to_euler(q, order="xyz"):
    """Quaternion -> Euler angles (quat.py:346-368); 'xyz' and 'yzx'."""
    q0, q1, q2, q3 = q[..., 0:1], q[..., 1:2], q[..., 2:3], q[..., 3:4]
    if order == "xyz":
        return jnp.concatenate(
            [
                jnp.arctan2(2.0 * (q0 * q1 + q2 * q3), 1.0 - 2.0 * (q1 * q1 + q2 * q2)),
                jnp.arcsin(jnp.clip(2.0 * (q0 * q2 - q3 * q1), -1.0, 1.0)),
                jnp.arctan2(2.0 * (q0 * q3 + q1 * q2), 1.0 - 2.0 * (q2 * q2 + q3 * q3)),
            ],
            axis=-1,
        )
    elif order == "yzx":
        return jnp.concatenate(
            [
                jnp.arctan2(2.0 * (q1 * q0 - q2 * q3), -q1 * q1 + q2 * q2 - q3 * q3 + q0 * q0),
                jnp.arctan2(2.0 * (q2 * q0 - q1 * q3), q1 * q1 - q2 * q2 - q3 * q3 + q0 * q0),
                jnp.arcsin(jnp.clip(2.0 * (q1 * q2 + q3 * q0), -1.0, 1.0)),
            ],
            axis=-1,
        )
    raise NotImplementedError(f"Cannot convert to ordering {order!r}")


# ---------------------------------------------------------------------------
# Forward / inverse kinematics
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def topo_levels(parents: tuple) -> tuple:
    """Group joint indices by depth in the skeleton tree.

    Returns ``(levels, level_parents)`` where ``levels[d]`` is an int numpy
    array of the joints whose depth is d (depth 0 = roots) and
    ``level_parents[d]`` their parents.  Static metadata computed once per
    skeleton and baked into the jitted program.
    """
    parents = tuple(int(p) for p in parents)
    depth = []
    for j, p in enumerate(parents):
        depth.append(0 if p < 0 else depth[p] + 1)
    max_d = max(depth)
    levels, level_parents = [], []
    for d in range(max_d + 1):
        idx = np.asarray([j for j in range(len(parents)) if depth[j] == d], dtype=np.int32)
        levels.append(idx)
        level_parents.append(np.asarray([parents[j] for j in idx], dtype=np.int32))
    return tuple(levels), tuple(level_parents)


def _as_parents_key(parents):
    return tuple(int(p) for p in np.asarray(parents).tolist())


@functools.lru_cache(maxsize=None)
def ancestor_chains(parents: tuple):
    """Static (J, D) ancestor index table, front-padded with the sentinel
    index J (an appended identity bone).  Row j lists root..j."""
    parents = tuple(int(p) for p in parents)
    J = len(parents)
    chains = []
    for j in range(J):
        c = []
        b = j
        while b != -1:
            c.append(b)
            b = parents[b]
        chains.append(list(reversed(c)))
    D = max(len(c) for c in chains)
    anc = np.full((J, D), J, dtype=np.int32)
    for j, c in enumerate(chains):
        anc[j, D - len(c):] = c
    return anc


def _with_identity(lrot, lpos, lvel=None, lang=None):
    """Append an identity bone at index J (used as chain padding)."""
    ident_q = jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0, 0.0], lrot.dtype),
        lrot.shape[:-2] + (1, 4))
    zero3 = jnp.zeros(lpos.shape[:-2] + (1, 3), lpos.dtype)
    out = [jnp.concatenate([lrot, ident_q], axis=-2),
           jnp.concatenate([lpos, zero3], axis=-2)]
    if lvel is not None:
        out.append(jnp.concatenate([lvel, zero3], axis=-2))
    if lang is not None:
        out.append(jnp.concatenate([lang, zero3], axis=-2))
    return out


def fk(lrot, lpos, parents):
    """Local -> global rotations/positions (quat.py:166-173),
    level-scheduled: joints grouped by tree depth, one batched update per
    level (sequential length = skeleton depth).

    lrot: (..., J, 4), lpos: (..., J, 3).

    An ancestor-chain variant (:func:`fk_chain_all`) exists for contexts
    where the scatter updates here miscompile (see xform.py NOTE) — the
    level form is the fast default for forward paths.
    """
    levels, lparents = topo_levels(_as_parents_key(parents))
    grot, gpos = lrot, lpos
    for lvl, par in zip(levels[1:], lparents[1:]):
        pr = grot[..., par, :]
        pp = gpos[..., par, :]
        grot = grot.at[..., lvl, :].set(mul(pr, lrot[..., lvl, :]))
        gpos = gpos.at[..., lvl, :].set(mul_vec(pr, lpos[..., lvl, :]) + pp)
    return grot, gpos


def fk_chain_all(lrot, lpos, parents):
    """Ancestor-chain FK: every joint accumulates the product along its
    static root->joint chain — only static gathers, no scatter updates
    (the training-loss-safe form; see xform.py NOTE)."""
    anc = ancestor_chains(_as_parents_key(parents))
    lrotp, lposp = _with_identity(lrot, lpos)
    gr = lrotp[..., anc[:, 0], :]
    gp = lposp[..., anc[:, 0], :]
    for d in range(1, anc.shape[1]):
        l_r = lrotp[..., anc[:, d], :]
        l_p = lposp[..., anc[:, d], :]
        gp = gp + mul_vec(gr, l_p)
        gr = mul(gr, l_r)
    return gr, gp


def ik(grot, gpos, parents):
    """Global -> local (quat.py:175-187); fully parallel gathers."""
    parents = np.asarray(parents)
    par = parents[1:]
    return (
        jnp.concatenate(
            [grot[..., :1, :], mul(inv(grot[..., par, :]), grot[..., 1:, :])],
            axis=-2,
        ),
        jnp.concatenate(
            [
                gpos[..., :1, :],
                mul_vec(
                    inv(grot[..., par, :]),
                    gpos[..., 1:, :] - gpos[..., par, :],
                ),
            ],
            axis=-2,
        ),
    )


def fk_vel(lrot, lpos, lvel, lang, parents):
    """FK propagating linear/angular velocities (quat.py:189-204),
    level-scheduled (see :func:`fk`; chain variant: fk_vel_chain_all)."""
    levels, lparents = topo_levels(_as_parents_key(parents))
    grot, gpos, gvel, gang = lrot, lpos, lvel, lang
    for lvl, par in zip(levels[1:], lparents[1:]):
        pr = grot[..., par, :]
        pp = gpos[..., par, :]
        pv = gvel[..., par, :]
        pa = gang[..., par, :]
        rp = mul_vec(pr, lpos[..., lvl, :])
        grot = grot.at[..., lvl, :].set(mul(pr, lrot[..., lvl, :]))
        gpos = gpos.at[..., lvl, :].set(rp + pp)
        gvel = gvel.at[..., lvl, :].set(
            mul_vec(pr, lvel[..., lvl, :]) + _cross(pa, rp) + pv
        )
        gang = gang.at[..., lvl, :].set(mul_vec(pr, lang[..., lvl, :]) + pa)
    return grot, gpos, gvel, gang


def fk_vel_chain_all(lrot, lpos, lvel, lang, parents):
    """Ancestor-chain form of :func:`fk_vel` (training-loss-safe; see
    xform.py NOTE)."""
    anc = ancestor_chains(_as_parents_key(parents))
    lrotp, lposp, lvelp, langp = _with_identity(lrot, lpos, lvel, lang)
    gr = lrotp[..., anc[:, 0], :]
    gp = lposp[..., anc[:, 0], :]
    gv = lvelp[..., anc[:, 0], :]
    ga = langp[..., anc[:, 0], :]
    for d in range(1, anc.shape[1]):
        l_r = lrotp[..., anc[:, d], :]
        l_p = lposp[..., anc[:, d], :]
        l_v = lvelp[..., anc[:, d], :]
        l_a = langp[..., anc[:, d], :]
        rp = mul_vec(gr, l_p)
        gv = gv + mul_vec(gr, l_v) + _cross(ga, rp)
        ga = ga + mul_vec(gr, l_a)
        gp = gp + rp
        gr = mul(gr, l_r)
    return gr, gp, gv, ga


@functools.lru_cache(maxsize=None)
def chain_to_root(parents: tuple, bone: int) -> tuple:
    """Static root->bone index chain for chain-restricted FK."""
    chain = []
    b = int(bone)
    while b != -1:
        chain.append(b)
        b = int(parents[b])
    return tuple(reversed(chain))


def fk_chain(lrot, lpos, parents, bone):
    """Global rotation/position of every joint on the root->``bone`` chain.

    TPU-native replacement for the reference's memoized recursive
    `fk_partial` (quat.py:241-272): the chain is static, so this unrolls to
    a handful of fused quaternion ops.  Returns dict {joint: (grot, gpos)}.
    """
    chain = chain_to_root(_as_parents_key(parents), int(bone))
    out = {}
    gr = lrot[..., chain[0], :]
    gp = lpos[..., chain[0], :]
    out[chain[0]] = (gr, gp)
    for j in chain[1:]:
        gp = mul_vec(gr, lpos[..., j, :]) + gp
        gr = mul(gr, lrot[..., j, :])
        out[j] = (gr, gp)
    return out


def fk_vel_bone(lrot, lpos, lvel, lang, parents, bone):
    """Global state of a single bone with velocities (quat.py:207-237),
    computed along the static root->bone chain."""
    chain = chain_to_root(_as_parents_key(parents), int(bone))
    j0 = chain[0]
    gp, gv = lpos[..., j0, :], lvel[..., j0, :]
    gr, ga = lrot[..., j0, :], lang[..., j0, :]
    for j in chain[1:]:
        rp = mul_vec(gr, lpos[..., j, :])
        gp_new = rp + gp
        gv = gv + mul_vec(gr, lvel[..., j, :]) + _cross(ga, rp)
        ga_new = ga + mul_vec(gr, lang[..., j, :])
        gr = mul(gr, lrot[..., j, :])
        gp, ga = gp_new, ga_new
    return gp, gv, gr, ga


def ik_look_at(bone_rotation, global_parent_rotation, global_rotation,
               global_position, child_position, target_position, eps=1e-5):
    """Aim a joint at a target (quat.py:276-290), branchless."""
    curr_dir = normalize(child_position - global_position)
    targ_dir = normalize(target_position - global_position)
    rotated = inv_mul(
        global_parent_rotation, mul(between(curr_dir, targ_dir), global_rotation)
    )
    needs = (
        jnp.abs(1.0 - jnp.sum(curr_dir * targ_dir, axis=-1)) > eps
    )[..., None]
    return jnp.where(needs, rotated, bone_rotation)


def ik_two_bone(bone_root_lr, bone_mid_lr, bone_root, bone_mid, bone_end,
                target, fwd, bone_root_gr, bone_mid_gr, bone_par_gr,
                max_length_buffer):
    """Analytic two-joint IK with pole vector (quat.py:295-343), branchless
    and batched over leading axes.  Returns new local rotations for the root
    (hip) and mid (knee) joints of the chain."""

    def _dot(a, b):
        return jnp.sum(a * b, axis=-1)

    max_extension = (
        length(bone_root - bone_mid)
        + length(bone_mid - bone_end)
        - max_length_buffer
    )

    too_far = (length(target - bone_root) > max_extension)[..., None]
    target_clamp = jnp.where(
        too_far,
        bone_root + max_extension[..., None] * normalize(target - bone_root),
        target,
    )

    axis_dwn = normalize(bone_end - bone_root)
    axis_rot = normalize(_cross(axis_dwn, fwd))

    a, b, c, t = bone_root, bone_mid, bone_end, target_clamp

    lab = length(b - a)
    lcb = length(b - c)
    lat = length(t - a)

    ac_ab_0 = jnp.arccos(jnp.clip(_dot(normalize(c - a), normalize(b - a)), -1.0, 1.0))
    ba_bc_0 = jnp.arccos(jnp.clip(_dot(normalize(a - b), normalize(c - b)), -1.0, 1.0))

    ac_ab_1 = jnp.arccos(
        jnp.clip((lab * lab + lat * lat - lcb * lcb) / (2.0 * lab * lat), -1.0, 1.0)
    )
    ba_bc_1 = jnp.arccos(
        jnp.clip((lab * lab + lcb * lcb - lat * lat) / (2.0 * lab * lcb), -1.0, 1.0)
    )

    r0 = from_angle_axis(ac_ab_1 - ac_ab_0, axis_rot)
    r1 = from_angle_axis(ba_bc_1 - ba_bc_0, axis_rot)

    c_a = normalize(bone_end - bone_root)
    t_a = normalize(target_clamp - bone_root)
    r2 = from_angle_axis(
        jnp.arccos(jnp.clip(_dot(c_a, t_a), -1.0, 1.0)),
        normalize(_cross(c_a, t_a)),
    )

    new_root_lr = inv_mul(bone_par_gr, mul(r2, mul(r0, bone_root_gr)))
    new_mid_lr = inv_mul(bone_root_gr, mul(r1, bone_mid_gr))
    return new_root_lr, new_mid_lr
