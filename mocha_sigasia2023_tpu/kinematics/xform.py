"""3x3 rotation-matrix ops + FK, used inside the differentiable losses.

Functional parity target: /root/reference/motion/xform.py and motion/txform.py
(both 49-line copies of the same math; one JAX module here).  Matrices are
(..., 3, 3) with rows on axis -2, matching the reference layout.
"""

from __future__ import annotations

import jax.numpy as jnp

from .quat import topo_levels, _as_parents_key, _cross
from ..ops.numerics import safe_unit_denom


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
    # safe_unit_denom: this is the path the recon loss drives with
    # NETWORK-PREDICTED txy — parallel/tiny columns must yield a finite
    # (garbage but bounded) rotation, not 0/0 = NaN + inf grads
    # (ops/numerics.py); real columns are bitwise-unaffected
    c2 = c2 / safe_unit_denom(c2)
    c1 = _cross(c2, c0)
    c1 = c1 / safe_unit_denom(c1)
    return jnp.stack([c0, c1, c2], axis=-1)


def fk_vel(lrot, lpos, lvel, lang, parents):
    """Matrix-form FK with velocity propagation (xform.py:34-49), via
    parallel ancestor-chain accumulation (see quat.fk: no scatter updates,
    only static gathers — the scatter form miscompiles in large fused
    backward programs on the v5e terminal compiler).

    lrot: (..., J, 3, 3); lpos/lvel/lang: (..., J, 3).
    """
    from .quat import ancestor_chains

    anc = ancestor_chains(_as_parents_key(parents))
    J = lpos.shape[-2]
    ident = jnp.broadcast_to(jnp.eye(3, dtype=lrot.dtype),
                             lrot.shape[:-3] + (1, 3, 3))
    zero3 = jnp.zeros(lpos.shape[:-2] + (1, 3), lpos.dtype)
    lrotp = jnp.concatenate([lrot, ident], axis=-3)
    lposp = jnp.concatenate([lpos, zero3], axis=-2)
    lvelp = jnp.concatenate([lvel, zero3], axis=-2)
    langp = jnp.concatenate([lang, zero3], axis=-2)

    gr = lrotp[..., anc[:, 0], :, :]
    gp = lposp[..., anc[:, 0], :]
    gv = lvelp[..., anc[:, 0], :]
    ga = langp[..., anc[:, 0], :]
    for d in range(1, anc.shape[1]):
        l_r = lrotp[..., anc[:, d], :, :]
        l_p = lposp[..., anc[:, d], :]
        l_v = lvelp[..., anc[:, d], :]
        l_a = langp[..., anc[:, d], :]
        rp = mul_vec(gr, l_p)
        gv = gv + mul_vec(gr, l_v) + jnp.cross(ga, rp)
        ga = ga + mul_vec(gr, l_a)
        gp = gp + rp
        gr = mul(gr, l_r)
    return gr, gp, gv, ga
