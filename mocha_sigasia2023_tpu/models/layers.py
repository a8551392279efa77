"""Functional NN building blocks (pure JAX, explicit param pytrees).

Design: parameters live in nested dicts using the torch tensor layout
(Linear weight (out, in); Conv2d weight (out, in, kh, kw)), which makes the
reference-checkpoint converter a mechanical key remap and lets parity tests
compare against /root/reference/net/{transformer,blocks}.py output
bit-for-bit.  Apply functions are pure, jit/vmap/grad-compatible, and thread
an explicit PRNG key for dropout.

Semantics targets: net/transformer.py (Attention:37-76, Transformer:79-95,
AdaIN:98-113, mean_variance_norm:13-20, FeedForward:23-34) and
net/blocks.py (SpatialConv:8-66, STGCN_Block:69-134).
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.numerics import safe_sqrt


# ---------------------------------------------------------------------------
# Initializers (torch defaults: kaiming-uniform a=sqrt(5) == U(±1/sqrt(fan)))
# ---------------------------------------------------------------------------


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def init_linear(key, in_dim, out_dim, bias=True, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    p = {"weight": _uniform(kw, (out_dim, in_dim), bound, dtype)}
    if bias:
        p["bias"] = _uniform(kb, (out_dim,), bound, dtype)
    return p


def init_conv2d(key, in_ch, out_ch, ksize=(1, 1), bias=True, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    fan_in = in_ch * ksize[0] * ksize[1]
    bound = 1.0 / math.sqrt(fan_in)
    p = {"weight": _uniform(kw, (out_ch, in_ch) + tuple(ksize), bound, dtype)}
    if bias:
        p["bias"] = _uniform(kb, (out_ch,), bound, dtype)
    return p


def init_layer_norm(dim, dtype=jnp.float32):
    return {"weight": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


# ---------------------------------------------------------------------------
# Primitive applies
# ---------------------------------------------------------------------------


def linear(p, x):
    y = x @ p["weight"].T
    if "bias" in p:
        y = y + p["bias"]
    return y


def layer_norm(p, x, eps=1e-5):
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mean) * lax.rsqrt(var + eps) * p["weight"] + p["bias"]


def dropout(x, rate, key: Optional[jax.Array], train: bool):
    if not train or rate == 0.0 or key is None:
        return x
    keep = 1.0 - rate
    # multiply-by-mask instead of select(where): the where/bernoulli form
    # participates in an XLA:TPU simplifier miscompile inside the large
    # fused training program on the v5e terminal's (older) compiler
    mask = (jax.random.uniform(key, x.shape) < keep).astype(x.dtype)
    return x * mask * (1.0 / keep)


def leaky_relu(x, slope=0.2):
    return jnp.where(x >= 0, x, slope * x)


def gelu(x):
    # torch nn.GELU default is the exact erf formulation
    return jax.nn.gelu(x, approximate=False)


def mean_variance_norm(x, eps=1e-5, axis=-2):
    """Instance-norm over tokens per channel for (b, s, c) inputs.

    Equivalent to the reference's mean_variance_norm on the permuted
    (b, c, s) layout (net/transformer.py:13-20).  NOTE: torch .std() is
    Bessel-corrected, and eps is added to the std (not the variance).
    """
    n = x.shape[axis]
    mean = x.mean(axis=axis, keepdims=True)
    var = x.var(axis=axis, keepdims=True) * (n / max(n - 1, 1))
    # safe_sqrt: var == 0 exactly (a dead ReLU channel — all tokens equal)
    # keeps the forward finite ((x-mean)/eps = 0) but the plain sqrt
    # backward is inf -> NaN grads; this op runs in the attention q/k path
    # of every training forward (see ops/numerics.py)
    return (x - mean) / (safe_sqrt(var) + eps)


def conv1x1(p, x):
    """Pointwise Conv2d on (n, c, t, v) tensors (compute in weight dtype)."""
    w = p["weight"][:, :, 0, 0]
    y = jnp.einsum("nctv,oc->notv", x.astype(w.dtype), w)
    if "bias" in p:
        y = y + p["bias"][None, :, None, None]
    return y


def temporal_conv(p, x, *, stride=1, reflect_pad=True):
    """Conv2d with kernel (k, 1) over the time axis of (n, c, t, v), with
    the reference's reflect same-padding (net/blocks.py:112-118)."""
    k = p["weight"].shape[2]
    x = x.astype(p["weight"].dtype)
    if reflect_pad and k > 1:
        pad = (k - 1) // 2
        x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")
    y = lax.conv_general_dilated(
        x, p["weight"], window_strides=(stride, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if "bias" in p:
        y = y + p["bias"][None, :, None, None]
    return y


# ---------------------------------------------------------------------------
# ST-GCN
# ---------------------------------------------------------------------------


def init_stgcn_block(key, in_ch, out_ch, K, t_kernel, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "gcn": init_conv2d(k1, in_ch, out_ch * K, (1, 1), dtype=dtype),
        "tcn": init_conv2d(k2, out_ch, out_ch, (t_kernel, 1), dtype=dtype),
    }


def spatial_conv(p, x, A):
    """Graph convolution: 1x1 conv to K*C channels, contract with the
    (K, V, V) adjacency stack (net/blocks.py:57-66)."""
    K = A.shape[0]
    y = conv1x1(p, x)
    n, kc, t, v = y.shape
    y = y.reshape(n, K, kc // K, t, v)
    return jnp.einsum("nkctv,kvw->nctw", y, A.astype(y.dtype))


def stgcn_block(p, x, A, *, activation="lrelu", t_stride=1):
    """Pre-activation ST-GCN block (net/blocks.py:69-134, norm='none'):
    act -> graph conv -> temporal conv (reflect same-pad)."""
    if activation == "lrelu":
        x = leaky_relu(x, 0.2)
    elif activation == "relu":
        x = jax.nn.relu(x)
    elif activation == "gelu":
        x = gelu(x)
    elif activation == "tanh":
        x = jnp.tanh(x)
    x = spatial_conv(p["gcn"], x, A)
    return temporal_conv(p["tcn"], x, stride=t_stride, reflect_pad=True)


# ---------------------------------------------------------------------------
# Context-matching transformer
# ---------------------------------------------------------------------------


def init_attention(key, dim, heads, dim_head, dtype=jnp.float32):
    inner = heads * dim_head
    ks = jax.random.split(key, 4)
    p = {
        "to_q": init_linear(ks[0], dim, inner, bias=False, dtype=dtype),
        "to_k": init_linear(ks[1], dim, inner, bias=False, dtype=dtype),
        "to_v": init_linear(ks[2], dim, inner, bias=False, dtype=dtype),
    }
    if not (heads == 1 and dim_head == dim):
        p["to_out"] = init_linear(ks[3], inner, dim, bias=True, dtype=dtype)
    return p


def attention(p, src, tar=None, *, heads, adain=False, drop=0.0,
              key=None, train=False):
    """Multi-head attention; with ``adain=True`` queries/keys are computed
    from instance-normalized (style-free) tokens while values keep style —
    the "context matching" attention (net/transformer.py:49-76)."""
    tar = src if tar is None else tar
    q_in = mean_variance_norm(src) if adain else src
    k_in = mean_variance_norm(tar) if adain else tar

    q = linear(p["to_q"], q_in)
    k = linear(p["to_k"], k_in)
    v = linear(p["to_v"], tar)

    b, n, inner = q.shape
    m = k.shape[1]
    dh = inner // heads
    scale = dh ** -0.5

    def split(t_):
        return t_.reshape(b, -1, heads, dh).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    use_fused = False
    if not (train and key is not None):
        from ..ops.attention import fused_attention, fused_attention_enabled

        use_fused = fused_attention_enabled()
    if use_fused:
        out = fused_attention(q, k, v, scale=scale)
    else:
        dots = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
        attn = jax.nn.softmax(dots, axis=-1)
        if train and key is not None:
            key, sub = jax.random.split(key)
            attn = dropout(attn, drop, sub, train)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
    if "to_out" in p:
        out = linear(p["to_out"], out)
        if train and key is not None:
            _, sub = jax.random.split(key)
            out = dropout(out, drop, sub, train)
    return out


def init_feedforward(key, dim, hidden, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "w1": init_linear(k1, dim, hidden, dtype=dtype),
        "w2": init_linear(k2, hidden, dim, dtype=dtype),
    }


def feedforward(p, x, *, drop=0.0, key=None, train=False):
    h = gelu(linear(p["w1"], x))
    if train and key is not None:
        key, sub = jax.random.split(key)
        h = dropout(h, drop, sub, train)
    h = linear(p["w2"], h)
    if train and key is not None:
        _, sub = jax.random.split(key)
        h = dropout(h, drop, sub, train)
    return h


def init_adain(key, fin, style_dim, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": init_linear(k1, style_dim, style_dim * 2, dtype=dtype),
        "fc2": init_linear(k2, style_dim * 2, fin * 2, dtype=dtype),
    }


def adain(p, x, style):
    """Token-level AdaIN (net/transformer.py:98-113): style tokens are
    average-pooled, mapped to (gamma, beta) through a LeakyReLU MLP, and
    modulate the instance-normalized input."""
    pooled = style.mean(axis=1)  # (b, c) — AdaptiveAvgPool1d over tokens
    h = leaky_relu(linear(p["fc1"], pooled), 0.2)
    gb = linear(p["fc2"], h)  # (b, 2*fin)
    fin = gb.shape[-1] // 2
    gamma = gb[:, None, :fin]
    beta = gb[:, None, fin:]
    return (1.0 + gamma) * mean_variance_norm(x) + beta


def init_transformer(key, dim, depth, heads, dim_head, mlp_dim, adain_on,
                     dtype=jnp.float32):
    layers = []
    for i in range(depth):
        key, ka, kb, kc = jax.random.split(key, 4)
        layer = {
            "attn": init_attention(ka, dim, heads, dim_head, dtype=dtype),
            "ff": init_feedforward(kb, dim, mlp_dim, dtype=dtype),
        }
        if adain_on:
            layer["adain"] = init_adain(kc, dim, dim, dtype=dtype)
        layers.append(layer)
    return {"layers": layers}


def transformer(p, x, sty=None, *, heads, adain_on=False, drop=0.0,
                key=None, train=False):
    """depth x [AdaIN? -> attention(+res) -> FF(+res)], no LayerNorm
    (net/transformer.py:79-95).  ``sty`` tokens drive both the AdaIN
    modulation and the cross-attention keys/values."""
    for layer in p["layers"]:
        if sty is not None and adain_on:
            x = adain(layer["adain"], x, sty)
        if key is not None:
            key, k1, k2 = jax.random.split(key, 3)
        else:
            k1 = k2 = None
        x = attention(layer["attn"], x, sty, heads=heads, adain=adain_on,
                      drop=drop, key=k1, train=train) + x
        x = feedforward(layer["ff"], x, drop=drop, key=k2, train=train) + x
    return x
