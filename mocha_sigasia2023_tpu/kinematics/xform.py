"""3x3 rotation-matrix ops + FK, used inside the differentiable losses.

Functional parity target: /root/reference/motion/xform.py and motion/txform.py
(both 49-line copies of the same math; one JAX module here).  Matrices are
(..., 3, 3) with rows on axis -2, matching the reference layout.
"""

from __future__ import annotations

import jax.numpy as jnp

from .quat import topo_levels, _as_parents_key, _cross


def mul(x, y):
    return jnp.matmul(x, y)


def mul_vec(x, v):
    return jnp.matmul(x, v[..., None])[..., 0]


def inv_mul(x, y):
    return jnp.matmul(jnp.swapaxes(x, -1, -2), y)


def inv_mul_vec(x, v):
    return jnp.matmul(jnp.swapaxes(x, -1, -2), v[..., None])[..., 0]


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
