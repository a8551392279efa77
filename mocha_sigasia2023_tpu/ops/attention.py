"""Pallas TPU fused attention for the MOCHA token sequences.

The generator attends over 90 tokens (15 temporal x 6 body parts,
model.py:35-37) with head dims 128/256 — the whole (N, d) block of one
(batch, head) fits comfortably in VMEM, so attention is a single-program
kernel per (batch*head): Q@K^T on the MXU, a numerically-stable softmax on
the VPU, and P@V on the MXU, with no HBM round-trip for the logits.  This
is the fusion XLA usually finds by itself at these sizes; the kernel exists
to pin it deterministically and to serve as the template for longer-window
variants.

Enable globally with :func:`set_fused_attention`; `models.layers.attention`
dispatches here when enabled and the shapes qualify.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ENABLED = False


def set_fused_attention(enabled: bool) -> None:
    global _ENABLED
    _ENABLED = bool(enabled)


def fused_attention_enabled() -> bool:
    return _ENABLED


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0]  # (N, d)
    k = k_ref[0]  # (M, d)
    v = v_ref[0]  # (M, d)
    dots = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    m = jnp.max(dots, axis=-1, keepdims=True)
    p = jnp.exp(dots - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(p.astype(v.dtype), v,
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def fused_attention(q, k, v, *, scale: float, interpret: bool = False):
    """softmax(q k^T * scale) v for (B, H, N, d) / (B, H, M, d) blocks.

    One grid program per (batch, head); the full token block stays in VMEM.
    """
    b, h, n, d = q.shape
    m = k.shape[2]
    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, m, d)
    vf = v.reshape(b * h, m, d)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, n, d)
