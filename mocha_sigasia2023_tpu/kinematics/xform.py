"""3x3 rotation-matrix ops + FK, used inside the differentiable losses.

Functional parity target: /root/reference/motion/xform.py and motion/txform.py
(both 49-line copies of the same math; one JAX module here).  Matrices are
(..., 3, 3) with rows on axis -2, matching the reference layout.
"""

from __future__ import annotations

import jax.numpy as jnp

from .quat import topo_levels, _as_parents_key, _cross


# NOTE: 3x3 products are spelled as broadcast-multiply + reduce, NOT
# matmul/einsum.  The XLA:TPU algebraic simplifier crashes (RET_CHECK in
# hlo_computation.cc:1773, observed on v5e) rewriting the transposed tiny
# dot_generals these produce in the backward pass of the FK loss; pure
# elementwise ops sidestep the pass and map to the VPU, which is the right
# unit for 3x3 work anyway.

def mul(x, y):
    """x @ y for (..., 3, 3) stacks."""
    return jnp.sum(x[..., :, :, None] * y[..., None, :, :], axis=-2)


def mul_vec(x, v):
    """x @ v for (..., 3, 3) x (..., 3)."""
    return jnp.sum(x * v[..., None, :], axis=-1)


def inv_mul(x, y):
    """x^T @ y (rotation inverse = transpose)."""
    return jnp.sum(x[..., :, :, None] * y[..., :, None, :], axis=-3)


def inv_mul_vec(x, v):
    """x^T @ v."""
    return jnp.sum(x * v[..., :, None], axis=-2)


def from_xy(xy):
    """6D two-column repr (..., 3, 2) -> full 3x3 via Gram-Schmidt/cross
    (xform.py:21-32).  Differentiable: this is the path the training loss
    uses to turn network `txy` output into rotation matrices."""
    c0 = xy[..., 0]
    c2 = _cross(c0, xy[..., 1])
    c2 = c2 / jnp.sqrt(jnp.sum(jnp.square(c2), axis=-1))[..., None]
    c1 = _cross(c2, c0)
    c1 = c1 / jnp.sqrt(jnp.sum(jnp.square(c1), axis=-1))[..., None]
    return jnp.stack([c0, c1, c2], axis=-1)


def fk_vel(lrot, lpos, lvel, lang, parents):
    """Matrix-form FK with velocity propagation (xform.py:34-49),
    level-scheduled like the quaternion version.

    lrot: (..., J, 3, 3); lpos/lvel/lang: (..., J, 3).
    """
    levels, lparents = topo_levels(_as_parents_key(parents))
    grot, gpos, gvel, gang = lrot, lpos, lvel, lang
    for lvl, par in zip(levels[1:], lparents[1:]):
        pr = grot[..., par, :, :]
        pp = gpos[..., par, :]
        pv = gvel[..., par, :]
        pa = gang[..., par, :]
        rp = mul_vec(pr, lpos[..., lvl, :])
        grot = grot.at[..., lvl, :, :].set(mul(pr, lrot[..., lvl, :, :]))
        gpos = gpos.at[..., lvl, :].set(rp + pp)
        gvel = gvel.at[..., lvl, :].set(
            mul_vec(pr, lvel[..., lvl, :]) + jnp.cross(pa, rp) + pv
        )
        gang = gang.at[..., lvl, :].set(mul_vec(pr, lang[..., lvl, :]) + pa)
    return grot, gpos, gvel, gang
