"""Gradient-safe primitives for differentiated code paths.

Motivation (round-5 convergence incident): a 296-step generator training
run at reference scale NaN'd instantly at step 210 with NO loss spike —
loss_total fell cleanly 44.0 -> 35.9 over 209 steps, then every metric
went NaN in one step.  That signature (finite forward, non-finite
backward) is the sqrt-at-zero gradient edge: d sqrt(x)/dx = 1/(2 sqrt(x))
is inf at x == 0, and ``0 * inf = NaN`` leaks through ``jnp.where``
branches that are value-safe but not gradient-safe (the classic JAX
double-where pitfall).  The concrete producers in this codebase, all
measured to emit non-finite gradients at their edges
(tests/test_numerics.py):

* ``mean_variance_norm``'s ``sqrt(var)`` with ``var == 0`` exactly — a
  ReLU'd conv channel whose tokens all go dead (identical values) is
  routine as training evolves, and the instance-norm forward stays
  perfectly finite (0 / eps) while the backward emits inf * 0 = NaN.
  This is the prime suspect for the step-210 kill: it sits in the
  attention q/k normalization, 6 forwards per training step.
* ``quat.log`` / ``quat.exp`` at the identity rotation (the vector-part
  norm underflows to exactly 0 in f32 below ~1e-19 per component).
* the 6D->rotation Gram-Schmidt division (``xform.from_xy``,
  ``quat.from_xform_xy``) when the NETWORK-PREDICTED columns become
  parallel or tiny: forward is 0/0 = NaN at the exact edge and the
  gradient explodes as ||cross||^-3 near it.
* ``quat.normalize`` at the zero vector (d||x||/dx = x/||x|| = 0/0).

The upstream reference has the same formulas (motion/xform.py:21-32,
motion/quat.py:96-107, net/transformer.py:13-20) and the same failure
mode in torch — ``torch.std()``'s backward at var == 0 divides by zero,
and ``clip_grad_norm_`` turns an inf norm into a zeroed step but
propagates a NaN one.  These wrappers are value- and gradient-identical
on non-degenerate data (bitwise: ``maximum(x, tiny)`` is the identity
for ``x >= tiny``) and keep every gradient finite at the edges, so one
degenerate batch element can no longer poison the parameters.
"""

import jax
import jax.numpy as jnp
import optax

__all__ = [
    "safe_sqrt",
    "safe_unit_denom",
    "safe_clip_by_global_norm",
]


def safe_sqrt(x, tiny: float = 1e-24):
    """sqrt with a finite gradient at x == 0.

    Bitwise-identical VALUES and GRADIENTS to ``jnp.sqrt`` for every
    ``x >= tiny``; for ``x < tiny`` returns ``sqrt(tiny)`` (instead of
    ~0) with zero gradient (instead of inf/NaN through the chain rule).
    ``tiny=1e-24`` caps the gradient magnification at 1/(2e-12) — far
    below f32 overflow even after loss weighting — while any genuine
    variance/norm of real activations (~O(1)) passes through untouched.
    """
    return jnp.sqrt(jnp.maximum(x, jnp.asarray(tiny, x.dtype)))


def safe_unit_denom(c, tiny: float = 1e-12):
    """Denominator for the ``c / ||c||`` Gram-Schmidt steps of the
    6D->rotation maps: ``sqrt(sum(c^2))`` with degenerate rows redirected
    to 1 (zero gradient through the untaken ``where`` branch), so
    parallel/zero predicted rotation columns yield a finite (garbage but
    bounded) rotation instead of 0/0 = NaN forward + inf backward.

    Bitwise-identical to ``sqrt(sum(c^2, -1, keepdims))`` whenever
    ``sum(c^2) > tiny`` — real 6D columns have ||cross|| ~ O(1), and even
    early-training network outputs (~1e-2 per component) sit 4 orders of
    magnitude above the 1e-6-norm cutoff.
    """
    ss = jnp.sum(jnp.square(c), axis=-1, keepdims=True)
    return jnp.sqrt(jnp.where(ss > tiny, ss, jnp.ones_like(ss)))


def safe_clip_by_global_norm(max_norm: float) -> optax.GradientTransformation:
    """``optax.clip_by_global_norm`` that survives non-finite gradients.

    Bit-identical to optax for finite gradients (same trigger + same
    ``(t / g_norm) * max_norm`` scaling, so the gradient-trajectory parity
    tests are unaffected).  When the global norm is inf or NaN the whole
    update is ZEROED: the optimizer state still advances (as the torch
    reference's ``clip_grad_norm_`` does when the norm is inf,
    trainer.py:78) but the parameters survive the step.  Plain optax
    propagates NaN here — ``t / nan * max_norm`` — which is how one
    degenerate batch killed a 296-step training run at step 210.
    """

    def update_fn(updates, state, params=None):
        del params
        g_norm = optax.global_norm(updates)
        finite = jnp.isfinite(g_norm)
        trigger = g_norm < max_norm  # False for inf AND NaN norms
        safe_norm = jnp.where(finite, g_norm, jnp.ones_like(g_norm))

        def clip_fn(t):
            clipped = jax.lax.select(
                trigger, t, (t / safe_norm.astype(t.dtype)) * max_norm)
            return jnp.where(finite, clipped, jnp.zeros_like(t))

        return jax.tree.map(clip_fn, updates), state

    return optax.GradientTransformation(
        lambda params: optax.EmptyState(), update_fn)
