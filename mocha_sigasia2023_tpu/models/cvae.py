"""Transformer CVAE: autoregressive character-feature predictor.

Architecture target: /root/reference/model_CVAE.py.  A conditional VAE over
the generator's 90-token encoder-feature space: PriorNet p(z|c) and
posterior Encoder q(z|x,c) read mu/logvar off two learned tokens prepended
to the sequence (model_CVAE.py:67-79, 113-125); the Decoder cross-attends
zero-initialized sincos-positioned queries to [z; c]
(model_CVAE.py:138-165).

The attention stacks replicate torch's post-norm
nn.TransformerEncoderLayer/DecoderLayer (activation=relu, batch_first) so
reference checkpoints load verbatim; params use packed qkv projections like
torch's MultiheadAttention.
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .layers import dropout, init_layer_norm, init_linear, layer_norm, linear


class CVAEConfig(NamedTuple):
    output_seq: int = 90
    latent_dim: int = 256
    depth: int = 2
    nheads: int = 4
    feedforward_dim: int = 512
    dropout: float = 0.1


# ---------------------------------------------------------------------------
# torch-compatible multi-head attention + post-norm layers
# ---------------------------------------------------------------------------


def init_mha(key, dim, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    # torch uses xavier_uniform for in_proj, kaiming-ish for out_proj
    bound = math.sqrt(6.0 / (dim + dim))
    return {
        "in_proj_weight": jax.random.uniform(k1, (3 * dim, dim), dtype, -bound, bound),
        "in_proj_bias": jnp.zeros((3 * dim,), dtype),
        "out_proj": init_linear(k2, dim, dim, dtype=dtype),
    }


def mha(p, query, kv, *, nheads, drop=0.0, key=None, train=False):
    d = query.shape[-1]
    # apply the packed in_proj as ONE matmul when q==kv (self-attention),
    # or a packed kv matmul for cross-attention — identical per-element
    # dot products, but larger MXU tiles than three separate projections
    if query is kv:
        qkv = query @ p["in_proj_weight"].T + p["in_proj_bias"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        wq, bq = p["in_proj_weight"][:d], p["in_proj_bias"][:d]
        q = query @ wq.T + bq
        kv_p = kv @ p["in_proj_weight"][d:].T + p["in_proj_bias"][d:]
        k, v = jnp.split(kv_p, 2, axis=-1)

    b, n, _ = q.shape
    m = k.shape[1]
    dh = d // nheads

    def split(t_):
        return t_.reshape(b, -1, nheads, dh).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    attn = jax.nn.softmax(jnp.einsum("bhnd,bhmd->bhnm", q, k) / math.sqrt(dh), axis=-1)
    if train and key is not None:
        key, sub = jax.random.split(key)
        attn = dropout(attn, drop, sub, train)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
    return linear(p["out_proj"], out)


def init_encoder_layer(key, dim, ff_dim, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    return {
        "self_attn": init_mha(ks[0], dim, dtype),
        "linear1": init_linear(ks[1], dim, ff_dim, dtype=dtype),
        "linear2": init_linear(ks[2], ff_dim, dim, dtype=dtype),
        "norm1": init_layer_norm(dim, dtype),
        "norm2": init_layer_norm(dim, dtype),
    }


def encoder_layer(p, x, *, nheads, drop=0.0, key=None, train=False,
                  out_tokens=None):
    """Post-norm torch TransformerEncoderLayer with relu activation.

    ``out_tokens=n`` computes outputs for the first n tokens only (queries
    restricted to x[:, :n], keys/values over the full sequence) — exactly
    the same values as slicing the full layer's output, since post-norm
    layers are per-token functions of the attention read."""
    if key is not None:
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
    else:
        k1 = k2 = k3 = k4 = None
    q_in = x if out_tokens is None else x[:, :out_tokens]
    sa = mha(p["self_attn"], q_in, x, nheads=nheads, drop=drop, key=k1,
             train=train)
    x = layer_norm(p["norm1"], q_in + dropout(sa, drop, k2, train))
    h = jax.nn.relu(linear(p["linear1"], x))
    h = dropout(h, drop, k3, train)
    h = linear(p["linear2"], h)
    x = layer_norm(p["norm2"], x + dropout(h, drop, k4, train))
    return x


def init_decoder_layer(key, dim, ff_dim, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    return {
        "self_attn": init_mha(ks[0], dim, dtype),
        "multihead_attn": init_mha(ks[1], dim, dtype),
        "linear1": init_linear(ks[2], dim, ff_dim, dtype=dtype),
        "linear2": init_linear(ks[3], ff_dim, dim, dtype=dtype),
        "norm1": init_layer_norm(dim, dtype),
        "norm2": init_layer_norm(dim, dtype),
        "norm3": init_layer_norm(dim, dtype),
    }


def decoder_layer(p, tgt, memory, *, nheads, drop=0.0, key=None, train=False):
    """Post-norm torch TransformerDecoderLayer."""
    if key is not None:
        key, k1, k2, k3, k4, k5, k6 = jax.random.split(key, 7)
    else:
        k1 = k2 = k3 = k4 = k5 = k6 = None
    sa = mha(p["self_attn"], tgt, tgt, nheads=nheads, drop=drop, key=k1, train=train)
    tgt = layer_norm(p["norm1"], tgt + dropout(sa, drop, k2, train))
    ca = mha(p["multihead_attn"], tgt, memory, nheads=nheads, drop=drop,
             key=k3, train=train)
    tgt = layer_norm(p["norm2"], tgt + dropout(ca, drop, k4, train))
    h = jax.nn.relu(linear(p["linear1"], tgt))
    h = dropout(h, drop, k5, train)
    h = linear(p["linear2"], h)
    tgt = layer_norm(p["norm3"], tgt + dropout(h, drop, k6, train))
    return tgt


def sincos_positional_encoding(max_len: int, d_model: int) -> np.ndarray:
    """Fixed sin/cos table (model_CVAE.py:168-186).  Computed in f32 like
    torch (default dtype promotion) to match the reference's registered
    ``pos_encoder.pe`` buffer (within 1 ulp of exp; exact agreement over
    the <=180 positions the CVAE actually uses)."""
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp((np.arange(0, d_model, 2)
                  * (-np.log(10000.0) / d_model)).astype(np.float32))
    pe = np.zeros((1, max_len, d_model), dtype=np.float32)
    pe[0, :, 0::2] = np.sin(position * div)
    pe[0, :, 1::2] = np.cos(position * div)
    return pe


# ---------------------------------------------------------------------------
# CVAE
# ---------------------------------------------------------------------------


def init_cvae(key, cfg: CVAEConfig, dtype=jnp.float32) -> Dict:
    d, ff = cfg.latent_dim, cfg.feedforward_dim
    keys = jax.random.split(key, 4 + 3 * cfg.depth)
    ki = iter(keys)

    def stack(init_fn):
        return [init_fn(next(ki), d, ff, dtype) for _ in range(cfg.depth)]

    return {
        "prior": {
            "mu_token": jax.random.normal(next(ki), (1, 1, d), dtype),
            "logvar_token": jax.random.normal(next(ki), (1, 1, d), dtype),
            "layers": stack(init_encoder_layer),
        },
        "posterior": {
            "mu_token": jax.random.normal(next(ki), (1, 1, d), dtype),
            "logvar_token": jax.random.normal(next(ki), (1, 1, d), dtype),
            "layers": stack(init_encoder_layer),
        },
        "decoder": {
            "layers": stack(init_decoder_layer),
        },
    }


def _encode_tokens(p, tokens, cfg: CVAEConfig, *, key=None, train=False):
    pe = jnp.asarray(sincos_positional_encoding(tokens.shape[1], cfg.latent_dim),
                     tokens.dtype)
    x = tokens + pe
    if train and key is not None:
        key, sub = jax.random.split(key)
        x = dropout(x, cfg.dropout, sub, train)
    n_layers = len(p["layers"])
    for i, layer in enumerate(p["layers"]):
        if key is not None:
            key, sub = jax.random.split(key)
        else:
            sub = None
        # only the mu/logvar tokens are read downstream, so the FINAL
        # layer needs just 2 query rows (keys/values stay full) — exact
        # (see encoder_layer out_tokens).  Inference-only: in training the
        # truncated dropout-mask shapes would change the RNG draw.
        out_tokens = 2 if (i == n_layers - 1 and not train) else None
        x = encoder_layer(layer, x, nheads=cfg.nheads, drop=cfg.dropout,
                          key=sub, train=train, out_tokens=out_tokens)
    return x[:, 0], x[:, 1]  # mu, logvar tokens


def prior(params, c, cfg: CVAEConfig, *, key=None, train=False):
    """p(z | c) (model_CVAE.py:49-92)."""
    p = params["prior"]
    b = c.shape[0]
    mu_tok = jnp.broadcast_to(p["mu_token"], (b, 1, cfg.latent_dim))
    lv_tok = jnp.broadcast_to(p["logvar_token"], (b, 1, cfg.latent_dim))
    tokens = jnp.concatenate([mu_tok, lv_tok, c], axis=1)
    return _encode_tokens(p, tokens, cfg, key=key, train=train)


def posterior(params, x, c, cfg: CVAEConfig, *, key=None, train=False):
    """q(z | x, c) (model_CVAE.py:95-135)."""
    p = params["posterior"]
    b = x.shape[0]
    mu_tok = jnp.broadcast_to(p["mu_token"], (b, 1, cfg.latent_dim))
    lv_tok = jnp.broadcast_to(p["logvar_token"], (b, 1, cfg.latent_dim))
    tokens = jnp.concatenate([mu_tok, lv_tok, c, x], axis=1)
    return _encode_tokens(p, tokens, cfg, key=key, train=train)


def reparameterize(key, mu, logvar):
    std = jnp.exp(0.5 * logvar)
    return mu + jax.random.normal(key, std.shape, std.dtype) * std


def decode(params, z, c, cfg: CVAEConfig, *, key=None, train=False):
    """Zero queries + sincos positions cross-attending to [z; c]
    (model_CVAE.py:159-165)."""
    b, _, d = c.shape
    memory = jnp.concatenate([z[:, None, :], c], axis=1)
    query = jnp.zeros((b, cfg.output_seq, d), c.dtype)
    pe = jnp.asarray(sincos_positional_encoding(cfg.output_seq, d), c.dtype)
    query = query + pe
    if train and key is not None:
        key, sub = jax.random.split(key)
        query = dropout(query, cfg.dropout, sub, train)
    x = query
    for layer in params["decoder"]["layers"]:
        if key is not None:
            key, sub = jax.random.split(key)
        else:
            sub = None
        x = decoder_layer(layer, x, memory, nheads=cfg.nheads,
                          drop=cfg.dropout, key=sub, train=train)
    return x


def forward(params, x, c, cfg: CVAEConfig, *, key, train=False):
    """Training forward: posterior sample -> decode; returns
    (out, (mu_po, logvar_po), (mu_pr, logvar_pr)) (model_CVAE.py:38-42)."""
    key, k_po, k_pr, k_rp, k_de = jax.random.split(key, 5)
    mu_po, logvar_po = posterior(params, x, c, cfg, key=k_po, train=train)
    mu_pr, logvar_pr = prior(params, c, cfg, key=k_pr, train=train)
    z = reparameterize(k_rp, mu_po, logvar_po)
    out = decode(params, z, c, cfg, key=k_de, train=train)
    return out, (mu_po, logvar_po), (mu_pr, logvar_pr)


def sample(params, c, cfg: CVAEConfig, *, key=None, deterministic=False,
           train=False):
    """Inference sampling: prior -> decode (model_CVAE.py:44-46)."""
    if key is None:
        deterministic = True
        k_pr = k_rp = k_de = None
    else:
        key, k_pr, k_rp, k_de = jax.random.split(key, 4)
    mu, logvar = prior(params, c, cfg, key=k_pr, train=train)
    z = mu if deterministic else reparameterize(k_rp, mu, logvar)
    return decode(params, z, c, cfg, key=k_de, train=train)
