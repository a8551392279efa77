"""MOCHA generator: ST-GCN motion embedding + context-matching transformer.

Architecture target: /root/reference/model.py:15-174.

    (B, 60, 24, 15) motion windows
      -> 1x1 conv to 64ch -> joint ST-GCN (24-joint graph, t-kernel 5) to 256
      -> pool to 6 body parts -> temporal avg-pool /4
      -> body ST-GCN (6-node star, t-kernel 3)
      -> (B, 90, 256) tokens (+ learned positional embedding)
      -> encoder transformer (self-attn, depth 2)
      -> decoder transformer (AdaIN + IN-q/k cross-attention on character
         tokens, depth 2)
      -> inverse embedding back to (B, 60, 24, 15)

Pure functions over an explicit param pytree; the static graph/pool
constants come from :mod:`.graph`.  ``encode`` / ``decode`` are exposed
separately because the streaming runtime drives them at different rates
(encode once per window, decode every frame, test_fullframework.py:188-194,
455-457).
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from . import graph
from .layers import (
    conv1x1, init_conv2d, init_stgcn_block, init_transformer,
    leaky_relu, mean_variance_norm, stgcn_block, temporal_conv,
    transformer,
)


class GeneratorConfig(NamedTuple):
    """Model hyperparameters (configs/config.yaml model section)."""

    mot_in_dim: int = 15
    nframes: int = 60
    njoints: int = 24
    nbody: int = 6
    temporal_patch_size: int = 4
    encoder_dim: int = 256
    encoder_depth: int = 2
    encoder_heads: int = 4
    encoder_dim_head: int = 128
    encoder_mlp_dim: int = 512
    decoder_dim: int = 256
    decoder_depth: int = 2
    decoder_heads: int = 4
    decoder_dim_head: int = 256
    decoder_mlp_dim: int = 512
    dropout: float = 0.1
    layout: str = "mocha"
    joint_strategy: str = "distance"
    joint_max_hop: int = 2
    bodypart_strategy: str = "distance"
    bodypart_max_hop: int = 1

    @property
    def num_temp(self) -> int:
        return self.nframes // self.temporal_patch_size

    @property
    def num_tokens(self) -> int:
        return self.nbody * self.num_temp

    @staticmethod
    def from_dict(d: Dict) -> "GeneratorConfig":
        g = d.get("graph", {})
        joint = g.get("joint", {})
        body = g.get("bodypart", {})
        return GeneratorConfig(
            mot_in_dim=d.get("mot_in_dim", 15),
            nframes=d.get("nframes", 60),
            njoints=d.get("njoints", 24),
            nbody=d.get("nbody", 6),
            temporal_patch_size=d.get("temporal_patch_size", 4),
            encoder_dim=d.get("encoder_dim", 256),
            encoder_depth=d.get("encoder_depth", 2),
            encoder_heads=d.get("encoder_heads", 4),
            encoder_dim_head=d.get("encoder_dim_head", 128),
            encoder_mlp_dim=d.get("encoder_mlp_dim", 512),
            decoder_dim=d.get("decoder_dim", 256),
            decoder_depth=d.get("decoder_depth", 2),
            decoder_heads=d.get("decoder_heads", 4),
            decoder_dim_head=d.get("decoder_dim_head", 256),
            decoder_mlp_dim=d.get("decoder_mlp_dim", 512),
            layout=joint.get("layout", "mocha"),
            joint_strategy=joint.get("strategy", "distance"),
            joint_max_hop=joint.get("max_hop", 2),
            bodypart_strategy=body.get("strategy", "distance"),
            bodypart_max_hop=body.get("max_hop", 1),
        )


def _constants(cfg: GeneratorConfig):
    A_j = jnp.asarray(graph.joint_adjacency(
        cfg.layout, cfg.joint_strategy, cfg.joint_max_hop), jnp.float32)
    A_b = jnp.asarray(graph.bodypart_adjacency(
        cfg.layout, cfg.bodypart_strategy, cfg.bodypart_max_hop), jnp.float32)
    pool = jnp.asarray(graph.pool_matrix(cfg.layout), jnp.float32)
    unpool = jnp.asarray(graph.unpool_matrix(cfg.layout), jnp.float32)
    return A_j, A_b, pool, unpool


def init_generator(key, cfg: GeneratorConfig, dtype=jnp.float32) -> Dict:
    A_j, A_b, _, _ = _constants(cfg)
    K_j, K_b = A_j.shape[0], A_b.shape[0]
    e, d, tps = cfg.encoder_dim, cfg.decoder_dim, cfg.temporal_patch_size

    keys = jax.random.split(key, 9)
    return {
        "pos_emb": jax.random.normal(
            keys[0], (1, cfg.num_tokens, e), dtype),
        "embed": {
            "conv_in": init_conv2d(keys[1], cfg.mot_in_dim, e // tps, (1, 1), dtype=dtype),
            "joint": init_stgcn_block(keys[2], e // tps, e, K_j, 5, dtype=dtype),
            "body": init_stgcn_block(keys[3], e, e, K_b, 3, dtype=dtype),
        },
        "encoder": init_transformer(
            keys[4], e, cfg.encoder_depth, cfg.encoder_heads,
            cfg.encoder_dim_head, cfg.encoder_mlp_dim, adain_on=False, dtype=dtype),
        "decoder": init_transformer(
            keys[5], d, cfg.decoder_depth, cfg.decoder_heads,
            cfg.decoder_dim_head, cfg.decoder_mlp_dim, adain_on=True, dtype=dtype),
        "head": {
            "body": init_stgcn_block(keys[6], d, d, K_b, 3, dtype=dtype),
            "joint": init_stgcn_block(keys[7], d, d // tps, K_j, 5, dtype=dtype),
            "conv_out": init_conv2d(keys[8], d // tps, cfg.mot_in_dim, (1, 1), dtype=dtype),
        },
    }


def _tconv_meanpool(p, x, tps: int) -> jnp.ndarray:
    """Reflect-padded temporal conv (kernel k) followed by the
    kernel==stride==tps mean-pool, folded into ONE stride-tps conv:
    out[p] = mean_i conv(x)[tps*p+i] = sum_m W'[m] x_pad[tps*p+m] with
    W'[m] = (1/tps) * sum_{i in [0,tps)} W[m-i].  Exact up to f32
    reassociation; requires t % tps == 0 and an odd kernel (the reference
    shapes: t=60, k=5, tps=4)."""
    w = p["weight"]                     # (O, I, k, 1)
    k = int(w.shape[2])
    pad = (k - 1) // 2
    F = np.zeros((k + tps - 1, k), np.float32)
    for i in range(tps):
        F[np.arange(k) + i, np.arange(k)] += 1.0 / tps
    w2 = jnp.einsum("oikv,mk->oimv", w, jnp.asarray(F, w.dtype))
    x = x.astype(w.dtype)
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")
    y = jax.lax.conv_general_dilated(
        x, w2, window_strides=(tps, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if "bias" in p:
        y = y + p["bias"][None, :, None, None]
    return y


def embed_tokens(params: Dict, cfg: GeneratorConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Motion window (B, T, V, C) -> tokens (B, num_temp*nbody, dim)
    (model.py:42-50 mot_embedding)."""
    A_j, A_b, pool, _ = _constants(cfg)
    tps = cfg.temporal_patch_size

    h = x.transpose(0, 3, 1, 2)  # b t v c -> b c t v
    h = conv1x1(params["embed"]["conv_in"], h)
    # Joint ST-GCN block (lrelu -> graph conv -> temporal conv, then
    # joint->bodypart pool and window mean-pool) with two exact folds:
    #   * the pool columns average to 1 and the temporal conv is spatially
    #     pointwise, so pool(tconv(g)) == tconv(pool(g)); the pool folds
    #     into the graph contraction (A_j @ pool, V 24 -> 6 before the
    #     expensive tconv — 4x fewer tconv FLOPs), and
    #   * tconv(k) followed by the kernel==stride==tps mean-pool is one
    #     stride-tps conv with the averaged kernel (another ~2.5x).
    # Same math as the reference order (model.py:42-50) up to f32
    # reassociation.
    h = leaky_relu(h, 0.2)
    y = conv1x1(params["embed"]["joint"]["gcn"], h)
    n, kc, t, v = y.shape
    K = A_j.shape[0]
    AP = jnp.einsum("kvw,wu->kvu", A_j, pool)
    h = jnp.einsum("nkctv,kvu->nctu", y.reshape(n, K, kc // K, t, v),
                   AP.astype(y.dtype))
    h = _tconv_meanpool(params["embed"]["joint"]["tcn"], h, tps)
    h = stgcn_block(params["embed"]["body"], h, A_b)
    # b c t v -> b (t v) c
    b, c, t, v = h.shape
    return h.transpose(0, 2, 3, 1).reshape(b, t * v, c)


def encode(params: Dict, cfg: GeneratorConfig, x: jnp.ndarray, *,
           key=None, train=False) -> jnp.ndarray:
    """Embedding + positional embedding + encoder transformer
    (model.py:84-93)."""
    tokens = embed_tokens(params, cfg, x)
    tokens = tokens + params["pos_emb"][:, : tokens.shape[1]]
    return transformer(
        params["encoder"], tokens, None, heads=cfg.encoder_heads,
        adain_on=False, drop=cfg.dropout, key=key, train=train)


def content_feature(encoded: jnp.ndarray) -> jnp.ndarray:
    """The 'cnt' context feature: per-channel instance norm over tokens
    (model.py:96-98, net/transformer.py:13-20)."""
    return mean_variance_norm(encoded)


def _decode_trunk_compact(params: Dict, cfg: GeneratorConfig, src_encoded,
                          cha_encoded, *, key=None, train=False):
    """Shared decoder trunk up to the body ST-GCN, BEFORE the
    nearest-neighbor temporal upsample / unpool duplications.  Returns
    (B, C, num_temp, nbody)."""
    A_b = _constants(cfg)[1]
    tok = transformer(
        params["decoder"], src_encoded, cha_encoded, heads=cfg.decoder_heads,
        adain_on=True, drop=cfg.dropout, key=key, train=train)
    # b (t v) c -> b c t v
    b, s, c = tok.shape
    h = tok.reshape(b, cfg.num_temp, cfg.nbody, c).transpose(0, 3, 1, 2)
    return stgcn_block(params["head"]["body"], h, A_b)


def _expand_trunk(h, cfg: GeneratorConfig):
    """Temporal NN-upsample (x tps) + unpool to joints: the duplication
    maps the reference applies between the body and joint head blocks
    (model.py:71-80).  (B, C, num_temp, nbody) -> (B, C, T, njoints)."""
    unpool = _constants(cfg)[3]
    h = jnp.repeat(h, cfg.temporal_patch_size, axis=2)
    return jnp.einsum("nctv,vw->nctw", h, unpool.astype(h.dtype))


def _decode_trunk(params: Dict, cfg: GeneratorConfig, src_encoded,
                  cha_encoded, *, key=None, train=False):
    """Trunk in the reference layout (B, C, T, njoints) — kept for
    decode_stream's sliced head."""
    return _expand_trunk(
        _decode_trunk_compact(params, cfg, src_encoded, cha_encoded,
                              key=key, train=train), cfg)


def decode(params: Dict, cfg: GeneratorConfig, src_encoded: jnp.ndarray,
           cha_encoded: jnp.ndarray, *, key=None, train=False) -> jnp.ndarray:
    """Decoder transformer + inverse embedding -> motion (model.py:100-106,
    71-80).

    The joint head block is evaluated with its lrelu + 1x1 graph conv
    HOISTED before the trunk's time-repeat/unpool (both pure duplication
    maps, so elementwise ops and channel mixes commute with them exactly),
    and the unpool folded into the adjacency contraction — ~6x fewer head
    FLOPs than the literal reference order, identical math."""
    A_j, _, _, unpool = _constants(cfg)
    if key is not None:
        key, kd = jax.random.split(key)
    else:
        kd = None
    h = _decode_trunk_compact(params, cfg, src_encoded, cha_encoded,
                              key=kd, train=train)
    p_j = params["head"]["joint"]
    g = conv1x1(p_j["gcn"], leaky_relu(h, 0.2))   # (B, K*C', num_temp, 6)
    n, kc, t, v = g.shape
    K = A_j.shape[0]
    UA = jnp.einsum("vw,kwu->kvu", unpool, A_j)    # (K, nbody, njoints)
    h = jnp.einsum("nkctv,kvu->nctu", g.reshape(n, K, kc // K, t, v),
                   UA.astype(g.dtype))             # (B, C', num_temp, 24)
    h = jnp.repeat(h, cfg.temporal_patch_size, axis=2)
    h = temporal_conv(p_j["tcn"], h)
    h = leaky_relu(h, 0.2)
    h = conv1x1(params["head"]["conv_out"], h)
    return h.transpose(0, 2, 3, 1)  # b c t v -> b t v c


def _joint0_support(cfg: GeneratorConfig):
    """Static column support of joint 0 in the joint adjacency stack: the
    graph-conv output at joint 0 only reads these input joints."""
    A = graph.joint_adjacency(cfg.layout, cfg.joint_strategy,
                              cfg.joint_max_hop)
    return np.nonzero(np.any(A[:, :, 0] != 0, axis=0))[0]


def decode_stream(params: Dict, cfg: GeneratorConfig,
                  src_encoded: jnp.ndarray, cha_encoded: jnp.ndarray):
    """Lean decoder for the streaming runtime: exactly the outputs the
    per-frame step consumes, nothing else.

    The full decoder (``decode``) produces (B, 60, 24, 15), but the frame
    step (test_fullframework.py:455-462, 492-495) reads only
      * the LAST frame's pose rows (all joints, all 15 channels), and
      * joint 0's velocity channels over the WHOLE window (the hip-speed
        ratio guard).
    Both tails of the head are sliced statically with identical math:
    the joint-level temporal conv's reflect window at frame T-1 touches
    input frames {T-1-pad..T-1} only, and joint 0's graph conv reads only
    its static adjacency support (7 of 24 joints for the mocha layout).
    Cuts the joint-head ST-GCN from 60x24 positions to 3x24 + 60x7.

    MEASURED RESULT (v5e, 64 streams, bench.py --lean-decode): 44% SLOWER
    than the full decode (12.5k vs 22.3k frames/s) — the small irregular
    conv shapes pad to MXU tiles far worse than the dense 60x24 head, so
    the 20% FLOP cut loses to utilization.  Kept as a verified-exact
    reference (tests/test_runtime.py TestLeanDecode) and for CPU serving,
    where FLOPs do bind; the runtime default is the full decode.

    Returns (last_Ytil (B, njoints, 15), vel0_til (B, T, 3)) — both still
    normalized (caller denorms with Y_std/Y_mean rows).
    """
    A_j, _, _, _ = _constants(cfg)
    u = _decode_trunk(params, cfg, src_encoded, cha_encoded)
    T = u.shape[2]

    p_j = params["head"]["joint"]
    co = params["head"]["conv_out"]
    w_t = p_j["tcn"]["weight"]          # (O, I, k, 1)
    k_t = w_t.shape[2]
    # the reflect-tap formula below assumes symmetric same-padding, which
    # only holds for odd temporal kernels (the reference uses k=5)
    assert k_t % 2 == 1, f"decode_stream requires an odd t-kernel, got {k_t}"
    pad = (k_t - 1) // 2
    K = A_j.shape[0]

    def gcn(x):
        y = conv1x1(p_j["gcn"], x)
        n, kc, tt, v = y.shape
        return y.reshape(n, K, kc // K, tt, v)

    # ---- last-frame pose: tcn window at T-1 = reflect{T-1-pad..T-1} ----
    lf = leaky_relu(u[:, :, T - 1 - pad:, :], 0.2)
    g = jnp.einsum("nkctv,kvw->nctw", gcn(lf), A_j.astype(lf.dtype))
    # reflect-padded correlation at output T-1: tap j reads slice-relative
    # frame pad - |pad - j|  (e.g. k=5 -> [0, 1, 2, 1, 0])
    pose = sum(
        jnp.einsum("niv,oi->nov", g[:, :, pad - abs(pad - j), :],
                   w_t[:, :, j, 0].astype(g.dtype))
        for j in range(k_t))
    pose = pose + p_j["tcn"]["bias"][None, :, None]
    pose = leaky_relu(pose, 0.2)
    pose = (jnp.einsum("niv,oi->nov", pose, co["weight"][:, :, 0, 0])
            + co["bias"][None, :, None])
    last = pose.transpose(0, 2, 1)                      # (B, V, 15)

    # ---- hip-velocity track: joint 0 over all frames ----
    jsub = _joint0_support(cfg)
    su = leaky_relu(u[:, :, :, jsub], 0.2)
    g0 = jnp.einsum("nkctv,kv->nct", gcn(su),
                    A_j[:, jsub, 0].astype(su.dtype))   # (B, C, T)
    v0 = temporal_conv(p_j["tcn"], g0[..., None])[..., 0]
    v0 = leaky_relu(v0, 0.2)
    vel0 = (jnp.einsum("nct,oc->not", v0, co["weight"][9:12, :, 0, 0])
            + co["bias"][9:12][None, :, None])
    return last, vel0.transpose(0, 2, 1)                # (B, T, 3)


def forward(params: Dict, cfg: GeneratorConfig, src_X: jnp.ndarray,
            cha_X: jnp.ndarray, *, extract_feature: bool = False,
            key=None, train=False):
    """Full generator forward (model.py:82-106)."""
    if key is not None:
        key, k1, k2, k3 = jax.random.split(key, 4)
    else:
        k1 = k2 = k3 = None
    src_encoded = encode(params, cfg, src_X, key=k1, train=train)
    cha_encoded = encode(params, cfg, cha_X, key=k2, train=train)
    if extract_feature:
        return (src_encoded, cha_encoded,
                content_feature(src_encoded), content_feature(cha_encoded))
    return decode(params, cfg, src_encoded, cha_encoded, key=k3, train=train)
