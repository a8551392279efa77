"""Training losses (pure JAX, differentiable end-to-end).

Semantics targets:
  * recon_criterion — 12-term weighted L1 with forward kinematics inside the
    loss (trainer.py:249-337)
  * convert_YtilToX — re-derive character-space X features from predicted
    parent-local Y via differentiable FK (trainer.py:339-374)
  * patch_nce_loss — InfoNCE over projected patches, negatives across the
    minibatch, diagonal masked (trainer.py:169-208)
  * kl_normal — KL between diagonal Gaussians (train_CVAE.py:16-24)

The reference needs a second, Torch copy of the kinematics library for
these; here the same `kinematics` module used by preprocessing and the
runtime differentiates directly.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..kinematics import quat, xform
from ..ops.numerics import safe_sqrt


def _split_channels(Y):
    b, t, j = Y.shape[:3]
    pos = Y[..., :3]
    txy = Y[..., 3:9].reshape(b, t, j, 3, 2)
    vel = Y[..., 9:12]
    ang = Y[..., 12:15]
    return pos, txy, vel, ang


def recon_criterion(Ytil, Ygt, parents, dt: float = 1.0 / 60.0,
                    compute_dtype=None):
    """Weighted L1 over local pose, FK'd character-space pose, and their
    finite differences (trainer.py:249-337).

    Ytil: (B, T, J-1, 15) prediction WITHOUT the root bone;
    Ygt:  (B, T, J, 15) ground truth including the root row (re-attached to
    the prediction before FK, trainer.py:269-273).

    ``compute_dtype=float64`` runs the whole loss tail in f64 (requires
    jax_enable_x64).  On the current v5e terminal compiler this is the
    reliable workaround for a fusion-dependent f32 miscompile that turns
    large loss+FK backward programs into NaNs (see kinematics/xform.py
    NOTE); the tail is a tiny fraction of step compute.
    """
    out_dtype = Ytil.dtype
    if compute_dtype is not None:
        Ytil = Ytil.astype(compute_dtype)
        Ygt = Ygt.astype(compute_dtype)
    gt_pos, gt_txy, gt_vel, gt_ang = _split_channels(Ygt)
    gt_xfm = xform.from_xy(gt_txy)

    p_pos, p_txy, p_vel, p_ang = _split_channels(Ytil)
    p_pos = jnp.concatenate([gt_pos[:, :, 0:1], p_pos], axis=2)
    p_txy = jnp.concatenate([gt_txy[:, :, 0:1], p_txy], axis=2)
    p_xfm = xform.from_xy(p_txy)
    p_vel = jnp.concatenate([gt_vel[:, :, 0:1], p_vel], axis=2)
    p_ang = jnp.concatenate([gt_ang[:, :, 0:1], p_ang], axis=2)

    G_gt = xform.fk_vel(gt_xfm, gt_pos, gt_vel, gt_ang, parents)
    G_p = xform.fk_vel(p_xfm, p_pos, p_vel, p_ang, parents)

    def char_space(G):
        g_xfm, g_pos, g_vel, g_ang = G
        r = g_xfm[:, :, 0:1]
        return (
            xform.inv_mul(r, g_xfm),
            xform.inv_mul_vec(r, g_pos - g_pos[:, :, 0:1]),
            xform.inv_mul_vec(r, g_vel),
            xform.inv_mul_vec(r, g_ang),
        )

    Qgt_xfm, Qgt_pos, Qgt_vel, Qgt_ang = char_space(G_gt)
    Qp_xfm, Qp_pos, Qp_vel, Qp_ang = char_space(G_p)

    def d(a):
        return (a[:, 1:] - a[:, :-1]) / dt

    def l1(w, a, b):
        return jnp.mean(w * jnp.abs(a - b))

    # The local-rotation delta term is computed on the flat 6-channel txy
    # view (identical elements, identical mean): the time-shifted
    # difference of the 5D (B,T,J,3,2) reshape is miscompiled by the
    # XLA:TPU optimizer into NaNs (verified op-by-op finite vs jit NaN on
    # v5e; same pass family as the kinematics/xform.py crash note).
    gt_txy6 = Ygt[..., 3:9]
    p_txy6 = jnp.concatenate([Ygt[:, :, 0:1, 3:9], Ytil[..., 3:9]], axis=2)

    return (
        l1(75.0, gt_pos, p_pos)
        + l1(10.0, gt_txy, p_txy)
        + l1(10.0, gt_vel, p_vel)
        + l1(1.25, gt_ang, p_ang)
        + l1(15.0, Qgt_pos, Qp_pos)
        + l1(5.0, Qgt_xfm, Qp_xfm)
        + l1(2.0, Qgt_vel, Qp_vel)
        + l1(0.75, Qgt_ang, Qp_ang)
        + l1(10.0, d(gt_pos), d(p_pos))
        + l1(1.75, d(gt_txy6), d(p_txy6))
        + l1(2.0, d(Qgt_pos), d(Qp_pos))
        + l1(0.75, d(Qgt_xfm), d(Qp_xfm))
    ).astype(out_dtype)


def convert_YtilToX(Ytil, Ygnd_root, parents, compute_dtype=None):
    """Predicted parent-local Y (no root) + ground-truth root row ->
    character-space X features via differentiable quaternion FK
    (trainer.py:339-374).  ``compute_dtype``: see recon_criterion."""
    out_dtype = Ytil.dtype
    if compute_dtype is not None:
        Ytil = Ytil.astype(compute_dtype)
        Ygnd_root = Ygnd_root.astype(compute_dtype)
    b, t = Ytil.shape[:2]
    r_pos, r_txy, r_vel, r_ang = _split_channels(Ygnd_root)
    p_pos, p_txy, p_vel, p_ang = _split_channels(Ytil)

    pos = jnp.concatenate([r_pos, p_pos], axis=2)
    txy = jnp.concatenate([r_txy, p_txy], axis=2)
    rot = quat.from_xform_xy(txy)
    vel = jnp.concatenate([r_vel, p_vel], axis=2)
    ang = jnp.concatenate([r_ang, p_ang], axis=2)

    # chain-form FK: scatter-based level FK miscompiles inside large fused
    # training programs on the v5e terminal (see kinematics/xform.py NOTE)
    Grot, Gpos, Gvel, Gang = quat.fk_vel_chain_all(rot, pos, vel, ang, parents)

    r = Grot[:, :, 0:1]
    Xpos = quat.inv_mul_vec(r, Gpos - Gpos[:, :, 0:1])
    Xrot = quat.inv_mul(r, Grot)
    Xtxy = quat.to_xform_xy(Xrot)
    Xvel = quat.inv_mul_vec(r, Gvel)
    Xang = quat.inv_mul_vec(r, Gang)

    j = Xpos.shape[2]
    return jnp.concatenate(
        [Xpos, Xtxy.reshape(b, t, j, 6), Xvel, Xang], axis=-1
    ).astype(out_dtype)


def patch_nce_loss(feat_q, feat_k, temp: float = 0.07,
                   all_negatives_from_minibatch: bool = True,
                   batch_size: int = 1, compute_dtype=None):
    """PatchNCE InfoNCE (trainer.py:169-208): positives are matching
    patches, negatives every other patch in the (mini)batch, diagonal
    filled with -10; keys are stopped gradients."""
    n, dim = feat_q.shape
    out_dtype = feat_q.dtype
    if compute_dtype is not None:
        feat_q = feat_q.astype(compute_dtype)
        feat_k = feat_k.astype(compute_dtype)
    # safe_sqrt: an exactly-zero projected patch (dead ReLU column in the
    # projector MLP) must not emit NaN grads via d||x||/dx = 0/0
    feat_q = feat_q / safe_sqrt(
        jnp.sum(jnp.square(feat_q), axis=1, keepdims=True))
    feat_k = feat_k / safe_sqrt(
        jnp.sum(jnp.square(feat_k), axis=1, keepdims=True))
    feat_k = jax.lax.stop_gradient(feat_k)

    l_pos = jnp.sum(feat_q * feat_k, axis=1, keepdims=True)  # (n, 1)

    bdim = 1 if all_negatives_from_minibatch else batch_size
    q = feat_q.reshape(bdim, -1, dim)
    k = feat_k.reshape(bdim, -1, dim)
    npatches = q.shape[1]
    l_neg = jnp.einsum("bnd,bmd->bnm", q, k)
    eye = jnp.eye(npatches, dtype=bool)[None]
    l_neg = jnp.where(eye, -10.0, l_neg).reshape(-1, npatches)

    logits = jnp.concatenate([l_pos, l_neg], axis=1) / temp
    # labels are all zero: the positive is column 0
    logp = jax.nn.log_softmax(logits, axis=1)
    loss = -logp[:, 0]
    return loss.mean().astype(out_dtype), logits.astype(out_dtype)


def contrastive_acc(logits, topk=(1, 5)):
    """Top-k accuracy of the positive logit (trainer.py:384-398)."""
    target = 0
    order = jnp.argsort(-logits, axis=1)
    out = []
    for k in topk:
        hit = jnp.any(order[:, :k] == target, axis=1)
        out.append(100.0 * jnp.mean(hit.astype(jnp.float32)))
    return out


def kl_normal(mu_po, logvar_po, mu_pr, logvar_pr):
    """KL(q || p) for diagonal Gaussians, summed over the last axis and
    clamped at zero (train_CVAE.py:16-24)."""
    elt = 0.5 * (
        logvar_pr - logvar_po
        + jnp.exp(logvar_po) / jnp.exp(logvar_pr)
        + (mu_po - mu_pr) ** 2 / jnp.exp(logvar_pr)
        - 1.0
    )
    return jnp.clip(jnp.sum(elt, axis=-1), 0.0, None)
